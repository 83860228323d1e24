package graft.streaming

import graft.SparkSuite

/** transitionPairs must bridge micro-batch boundaries: the last
  * event of batch 1 rides in state, so batch 2's first event emits
  * the cross-batch pair.
  */
class TransitionStreamSpec extends SparkSuite {

  test("transition pairs cross micro-batch boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Chg]
    val q = StreamingOps.transitionPairs(input.toDS())
      .toDF().writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("trans_spec")
      .start()
    try {
      // batch 1 delivered out of order: (view@1, click@2)
      input.addData(Chg(1L, 2L, "click", 11L), Chg(1L, 1L, "view", 10L))
      q.processAllAvailable()
      // batch 2: purchase@3 — must pair with the carried click
      input.addData(Chg(1L, 3L, "purchase", 12L))
      q.processAllAvailable()
      val pairs = spark.table("trans_spec")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(pairs.sorted === Seq(
        ("click", "purchase"), ("view", "click")),
        s"got $pairs")
    } finally q.stop()
  }

  test("per-user state is independent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Chg]
    val q = StreamingOps.transitionPairs(input.toDS())
      .toDF().writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("trans_spec2")
      .start()
    try {
      input.addData(Chg(1L, 1L, "view", 1L), Chg(2L, 2L, "click", 2L))
      q.processAllAvailable()
      // one event per user so far → no pairs at all
      assert(spark.table("trans_spec2").count() === 0)
      input.addData(Chg(2L, 3L, "purchase", 3L))
      q.processAllAvailable()
      val pairs = spark.table("trans_spec2")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(pairs === Seq(("click", "purchase")))
    } finally q.stop()
  }
}
