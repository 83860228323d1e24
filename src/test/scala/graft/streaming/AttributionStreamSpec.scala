package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Drives [[StreamingOps.attributionStream]] across micro-batches:
  * the last-touch state must survive batch boundaries, in-batch
  * disorder must be repaired by the (us, event_id) sort, and a
  * purchase with no prior touch must emit with empty touch fields.
  */
class AttributionStreamSpec extends SparkSuite {

  test("last-touch state carries across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Chg]
    val q = StreamingOps.attributionStream(input.toDS())
      .toDF().writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("attrib_spec")
      .start()
    try {
      // Batch 1, delivered OUT of order: the click at t=10 must win
      // over the view at t=5 for the purchase at t=20; user 2's
      // purchase has no touch at all.
      input.addData(
        Chg(1L, 20L, "purchase", 103L),
        Chg(1L, 5L, "view", 101L),
        Chg(1L, 10L, "click", 102L),
        Chg(2L, 7L, "purchase", 201L))
      q.processAllAvailable()
      // Batch 2: no new touch — user 1's purchase attributes to the
      // click carried in state from batch 1.
      input.addData(Chg(1L, 50L, "purchase", 104L))
      q.processAllAvailable()

      val rows = spark.table("attrib_spec")
        .select(col("event_id"), col("touch_event_id"),
          col("touch_type"), col("gap_us"))
        .collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3))))
        .sortBy(_._1)
      assert(rows.toSeq === Seq(
        (103L, Some(102L), Some("click"), Some(10L)),
        (104L, Some(102L), Some("click"), Some(40L)),
        (201L, None, None, None)))
    } finally q.stop()
  }
}
