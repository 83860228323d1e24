package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Stage-level attribution for one or more SparkEntry queries —
  * guide §1 ("measure first"): run each named query to the noop sink
  * under a listener that records per-stage wall, task count, and
  * shuffle bytes, then print the stages sorted by duration. Usage:
  *
  *   sbt "runMain graft.Profile <sfDir> <query> [query...]"
  *
  * Iteration aid only; the driver never runs this.
  */
object Profile {

  final case class StageRow(
      id: Int, name: String, tasks: Int, ms: Long,
      shuffleReadMb: Double, shuffleWriteMb: Double, inputMb: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer.empty[StageRow]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {
          t0 <- si.submissionTime; t1 <- si.completionTime
        } yield t1 - t0).getOrElse(-1L)
        val m = si.taskMetrics
        val ops = si.rddInfos.flatMap(r => r.scope)
          .map(_.name).distinct.mkString(">")
        stages += StageRow(
          si.stageId, ops + " @ " + si.name.takeWhile(_ != '\n'),
          si.numTasks, ms,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup outside attribution
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    names.foreach { name =>
      stages.clear(); jobs = 0
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let the listener bus drain
      spark.catalog.clearCache()
      println(f"\n===== $name: $sec%.2f s, $jobs jobs, " +
        f"${stages.size} stages =====")
      val byDur = stages.sortBy(-_.ms)
      val shown = byDur.take(30)
      shown.foreach { s =>
        println(f"  ${s.ms}%6d ms  ${s.tasks}%4d tasks  " +
          f"sr=${s.shuffleReadMb}%8.2f MB sw=${s.shuffleWriteMb}%8.2f MB " +
          f"in=${s.inputMb}%8.2f MB  [${s.id}] ${s.name.take(80)}")
      }
      val tail = byDur.drop(30)
      if (tail.nonEmpty)
        println(f"  (+${tail.size} more stages, " +
          f"${tail.map(_.ms).sum}%d ms total)")
      println(f"  stage-ms sum: ${stages.map(_.ms).sum}")
    }
    spark.stop()
  }
}
