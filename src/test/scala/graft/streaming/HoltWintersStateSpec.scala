package graft.streaming

import graft.SparkSuite

/** Holt-Winters streaming state must survive micro-batch boundaries
  * AND reproduce the batch fold bit-for-bit — the level, trend, and
  * all four seasonal slots.
  */
class HoltWintersStateSpec extends SparkSuite {

  test("split delivery equals the batch operator's fold exactly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.functions._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val values = Seq(10.0, 22.0, 31.0, 44.0, 12.0, 24.0, 29.0, 47.0)
    def meas(from: Int, to: Int): Seq[Meas] =
      (from until to).map(i => Meas(1L, i.toLong, i.toLong, values(i)))

    val input = MemoryStream[Meas]
    val q = StreamingOps.holtWintersState(input.toDS())
      .toDF().writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("hw_spec")
      .start()
    try {
      // batch 1: first five obs, delivered out of order in-batch
      input.addData(meas(0, 5).reverse: _*)
      q.processAllAvailable()
      // batch 2: the rest — state must carry l/b/s across
      input.addData(meas(5, 8): _*)
      q.processAllAvailable()
      val last = spark.table("hw_spec")
        .orderBy(col("n").desc).collect().head
      val batch = graft.operators.TimeSeries.holtWintersHalf(
          values.zipWithIndex.map { case (v, i) =>
            (1L, i.toLong, i.toLong, v)
          }.toDF("k", "t", "tie", "v"),
          Seq("k"), Seq("t", "tie"), "v")
        .collect().head
      assert(last.getLong(1) === 8L)
      // streaming state is unrounded; batch output rounds at 6 dp
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r6(last.getDouble(2)) === batch.getDouble(2)) // level
      assert(r6(last.getDouble(3)) === batch.getDouble(3)) // trend
      (0 to 3).foreach { s =>
        assert(r6(last.getDouble(4 + s)) === batch.getDouble(4 + s),
          s"slot $s")
      }
    } finally q.stop()
  }
}
