package graft

/** CLI entry: run the reference-pipeline replication end-to-end on a
  * profiles CSV (the real okcupid_profiles.csv, or the fixture).
  * Usage: runMain graft.OkCupidMain <csv> [minDocFreq minTermFreq]
  */
object OkCupidMain {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val minDf = if (args.length > 1) args(1).toInt else 25
    val minTf = if (args.length > 2) args(2).toInt else 35
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val profiles = OkCupidPipeline.load(spark, path)
    val (confusion, accuracy) =
      OkCupidPipeline.trainAndEvaluate(profiles, minDf, minTf)
    confusion.show(false)
    println(f"accuracy=$accuracy%.4f train_eval_sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
