package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The restart contract every production stream in this engine
  * leans on: a file-source query with a checkpointLocation must,
  * after a stop/restart, process exactly the files that arrived
  * while it was down — no reprocessing of pre-restart batches, no
  * holes. (The stateful twins prove state carries across
  * micro-batches; this proves PROGRESS carries across process
  * restarts, which is what makes the foreachBatch parquet sinks —
  * classify, percolate, dedupIngest — exactly-once per batch.)
  */
class CheckpointRestartSpec extends SparkSuite {

  test("restart from checkpoint resumes without duplicates or holes") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    val in = s"$root/in"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"

    def run(): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = spark.readStream.schema(schema).parquet(in)
        .withColumn("doubled", col("v") * 2)
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            b.write.mode("append").parquet(out)
            ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    (1L to 5L).toDF("v").write.mode("append").parquet(in)
    run()
    val afterFirst = spark.read.parquet(out).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(afterFirst === (1L to 5L))

    // second wave lands while the query is DOWN; restart must pick
    // up exactly these files
    (6L to 9L).toDF("v").repartition(1).write.mode("append").parquet(in)
    run()
    val afterSecond = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(afterSecond === (1L to 9L).map(i => (i, 2 * i)))

    // a third restart with NOTHING new must emit nothing
    run()
    assert(spark.read.parquet(out).count() === 9L)
  }
}
