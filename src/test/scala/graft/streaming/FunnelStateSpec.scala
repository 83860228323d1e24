package graft.streaming

import graft.SparkSuite

/** funnelState accumulates per-stage minimum touch times across
  * micro-batches, and — because each event only min-merges into its
  * slot — out-of-order and split delivery cannot change the final
  * state.
  */
class FunnelStateSpec extends SparkSuite {

  test("stage mins accumulate across batches; order-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Chg]
    val q = StreamingOps.funnelState(input.toDS())
      .toDF().writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("funnel_spec")
      .start()
    try {
      // batch 1 delivers the view BEFORE the signup (out of order)
      input.addData(Chg(1L, 200L, "view", 11L), Chg(1L, 100L, "signup", 10L))
      q.processAllAvailable()
      // batch 2: a second, LATER view must not move t2; a click lands
      input.addData(Chg(1L, 500L, "view", 12L), Chg(1L, 300L, "click", 13L))
      q.processAllAvailable()
      val last = spark.table("funnel_spec")
        .orderBy(org.apache.spark.sql.functions.col("n").desc)
        .collect().head
      assert((last.getLong(1), last.getLong(2), last.getLong(3),
        last.getLong(4), last.getLong(5)) === ((4L, 100L, 200L, 300L, 0L)))
    } finally q.stop()
  }

  test("per-user state is independent; unknown types only count") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Chg]
    val q = StreamingOps.funnelState(input.toDS())
      .toDF().writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("funnel_spec2")
      .start()
    try {
      input.addData(
        Chg(1L, 10L, "signup", 1L), Chg(2L, 20L, "purchase", 2L),
        Chg(2L, 30L, "other", 3L))
      q.processAllAvailable()
      val rows = spark.table("funnel_spec2")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
      assert(rows(1L) === ((1L, 10L, 0L)))
      // user 2: purchase recorded, "other" only bumped n
      assert(rows(2L) === ((2L, 0L, 20L)))
    } finally q.stop()
  }
}
