package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class CalibrationSpec extends SparkSuite {
  import spark.implicits._

  test("isotonicBins pools the classic adjacent violator, respects " +
      "weights, leaves monotone input untouched, and refuses " +
      "oversized bin tables") {
    // rates [0.2, 0.6, 0.4, 0.8] -> PAV pools bins 2-3 to 0.5
    val classic = Seq(("c", 1L, 10L, 2L), ("c", 2L, 10L, 6L),
      ("c", 3L, 10L, 4L), ("c", 4L, 10L, 8L))
    // weighted pool: rates [1.0, 0.0] with weights [1, 3] -> 0.25
    val weighted = Seq(("w", 1L, 1L, 1L), ("w", 2L, 3L, 0L))
    // already monotone: identity
    val mono = Seq(("m", 1L, 10L, 1L), ("m", 2L, 10L, 5L),
      ("m", 3L, 10L, 9L))
    val out = Calibration.isotonicBins(
        (classic ++ weighted ++ mono).toDF("g", "b", "n", "pos"),
        "g", "b", "n", "pos")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(b => out(("c", b)))
      === Seq(200000L, 500000L, 500000L, 800000L), s"$out")
    assert(out(("w", 1L)) === 250000L && out(("w", 2L)) === 250000L)
    assert(Seq(1L, 2L, 3L).map(b => out(("m", b)))
      === Seq(100000L, 500000L, 900000L))
    val e = intercept[IllegalArgumentException] {
      Calibration.isotonicBins(
        classic.toDF("g", "b", "n", "pos"), "g", "b", "n", "pos",
        maxBins = 2L)
    }
    assert(e.getMessage.contains("maxBins"))
  }
}
