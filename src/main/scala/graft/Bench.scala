package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Queries execute to a `noop` sink — `count()` would let Catalyst
  * prune projections and undercount the real work (e.g. a regex-clean
  * query "counts" without ever running the regex).
  */
object Bench {

  /** Representative subset across the engine's surface: relational
    * agg/join/top-k, the text pipeline (split, stem chain, TF-IDF),
    * dedup (LSH), similarity, window/session analytics.
    */
  val headline: Seq[String] = Seq(
    "q1_agg", "q_join_agg", "q_topk_orders",
    "q_top_words", "q_pipeline_tokens", "q_tfidf",
    "q_dedup_minhash", "q_ann_topk",
    "q_events_window", "q_sessions")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup outside the timed region
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val results = headline.map(n => n -> run(n))
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
