package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

import scala.util.Random

/** RangeJoin.bucketedIntervalOverlap: equivalence with the naive
  * theta join on seeded random intervals (boundary touches, spans
  * crossing many buckets), exactly-once emission, and null/inverted
  * bound handling.
  */
class IntervalOverlapSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rnd = new Random(42)
  private def mkIntervals(n: Int, tag: String) =
    (0 until n).map { i =>
      val lo = rnd.nextInt(1000).toLong
      // widths up to 8 bucket-lengths at bucketWidth=25
      (s"$tag$i", lo, lo + rnd.nextInt(200).toLong)
    }

  private lazy val left = mkIntervals(60, "L")
    .toDF("l_id", "l_lo", "l_hi")
  private lazy val right = mkIntervals(60, "R")
    .toDF("r_id", "r_lo", "r_hi")

  private def naive: Set[(String, String)] =
    left.crossJoin(right)
      .where(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select(col("l_id"), col("r_id"))
      .as[(String, String)].collect().toSet

  test("equals the naive theta join across bucket widths") {
    for (w <- Seq(5.0, 25.0, 400.0, 5000.0)) {
      val rows = RangeJoin.bucketedIntervalOverlap(
          left, "l_lo", "l_hi", right, "r_lo", "r_hi", w)
        .select(col("l_id"), col("r_id"))
        .as[(String, String)].collect()
      // exactly-once: no duplicate pair from multi-bucket overlap
      assert(rows.length == rows.toSet.size, s"dup pairs at width $w")
      assert(rows.toSet == naive, s"width $w")
    }
  }

  test("boundary touch matches; disjoint neighbors do not") {
    val a = Seq(("a", 0L, 10L)).toDF("l_id", "l_lo", "l_hi")
    val b = Seq(("touch", 10L, 20L), ("gap", 11L, 20L))
      .toDF("r_id", "r_lo", "r_hi")
    val got = RangeJoin.bucketedIntervalOverlap(
        a, "l_lo", "l_hi", b, "r_lo", "r_hi", 7.0)
      .select(col("r_id")).as[String].collect().toSeq
    assert(got == Seq("touch"))
  }

  test("null and inverted bounds never match") {
    val a = Seq((Some(0L), Some(100L), "ok"), (None, Some(5L), "null-lo"),
      (Some(5L), None, "null-hi"), (Some(50L), Some(10L), "inverted"))
      .toDF("l_lo", "l_hi", "l_id")
    val b = Seq((0L, 100L, "r")).toDF("r_lo", "r_hi", "r_id")
    val got = RangeJoin.bucketedIntervalOverlap(
        a, "l_lo", "l_hi", b, "r_lo", "r_hi", 10.0)
      .select(col("l_id")).as[String].collect().toSeq
    assert(got == Seq("ok"))
  }

  test("bucketWidth validation") {
    intercept[IllegalArgumentException] {
      RangeJoin.bucketedIntervalOverlap(
        left, "l_lo", "l_hi", right, "r_lo", "r_hi", 0.0)
    }
  }
}
