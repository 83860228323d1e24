package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BenfordSpec extends SparkSuite {
  import spark.implicits._

  test("digits, counts and benford expectations") {
    val df = Seq(123L, 19L, 1L, 2000L, 95L, 0L, -4L)
      .toDF("v") // 0 and −4 excluded
    val out = DataQuality.benford(df, "v").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("1", 3L), ("2", 1L), ("9", 1L)))
    // expected_ppm: round(log10(1+1/d)·1e6)
    assert(out.head.getLong(3) === 301030L)      // d=1
    assert(out(1).getLong(3) === 176091L)        // d=2
    assert(out.last.getLong(3) === 45757L)       // d=9
    // observed ppm: integer floor division of exact counts
    assert(out.head.getLong(2) === 600000L)
    assert(out(1).getLong(2) === 200000L)
  }

  test("decimal-string inputs take the first significant digit") {
    val df = Seq("0.042", "7.5", "0.9").toDF("v")
      .select(col("v").cast("decimal(10,3)").as("v"))
    val out = DataQuality.benford(df, "v").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("4", "7", "9"))
  }
}
