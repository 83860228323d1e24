package graft.streaming

import graft.SparkSuite

/** Holt state must survive micro-batch boundaries: folding [1,2] in
  * batch 1 and [3] in batch 2 must equal the batch operator's fold of
  * [1,2,3] — (level 2.375, trend 0.5625), the TimeSeriesSpec hand
  * calc.
  */
class HoltStateSpec extends SparkSuite {

  test("level/trend state carries across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Meas]
    val q = StreamingOps.holtState(input.toDS())
      .toDF().writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("holt_spec")
      .start()
    try {
      input.addData(Meas(1L, 2L, 1L, 2.0), Meas(1L, 1L, 1L, 1.0))
      q.processAllAvailable()
      input.addData(Meas(1L, 3L, 1L, 3.0))
      q.processAllAvailable()
      // update mode appends one row per trigger; the LAST row for the
      // key is the carried state after batch 2
      val rows = spark.table("holt_spec")
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      assert(rows.contains((2L, 1.5, 0.25)), s"batch-1 state in $rows")
      assert(rows.contains((3L, 2.375, 0.5625)), s"batch-2 state in $rows")
    } finally q.stop()
  }
}
