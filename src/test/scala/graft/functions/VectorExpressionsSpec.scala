package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The native codegen vector kernels agree bit-for-bit with their
  * interpreted HOF formulations (same sequential fold order) over
  * float and double arrays, including length-mismatch and null
  * handling.
  */
class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def hofDist2 = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  test("euclidean_dist2 equals the HOF fold bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 6.0f, 3.5f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.1f, 0.2f, 0.3f)),
      (Array(-1.5f, 2.25f, 0.0f), Array(3.125f, -0.5f, 7.0f))
    ).toDF("a", "b")
    val rows = df.select(
      euclidean_dist2($"a", $"b").as("native"),
      hofDist2($"a", $"b").as("hof")).as[(Double, Double)].collect()
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n)
        == java.lang.Double.doubleToLongBits(h), s"$n != $h")
    }
  }

  test("euclidean_dist2 handles double arrays and nulls") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(4.0, 6.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0)), None)
    ).toDF("a", "b")
    val out = df.select(euclidean_dist2($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 25.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  // mismatched dims are a caller bug (wrong model version in one
  // table) — both kernels now RAISE instead of silently scoring the
  // common prefix (the pre-hardening truncation convention), matching
  // the ElementwiseMin aggregate's loud mixed-length contract
  test("mismatched embedding lengths raise loudly") {
    val df = Seq((Seq(1.0, 2.0, 9.0), Seq(2.0, 4.0)))
      .toDF("a", "b")
    for (k <- Seq(euclidean_dist2($"a", $"b"),
        cosine_similarity($"a", $"b"))) {
      val e = intercept[Exception] { df.select(k).head() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("mismatched embedding lengths")),
        s"$e")
    }
  }

  // parquet-derived arrays default to containsNull=true: a null
  // ELEMENT must null the result (the zip_with semantics the kernels
  // claim bit-identity with), never read as 0.0
  test("null elements propagate null, equal-length non-null rows " +
      "still compute") {
    val df = Seq((1L, true), (2L, false)).toDF("id", "ok")
      .select(col("id"),
        when(col("ok"), array(lit(1.0), lit(2.0)))
          .otherwise(array(lit(1.0), lit(null).cast("double"))).as("a"),
        array(lit(2.0), lit(4.0)).as("b"))
    val rows = df.select(col("id"), euclidean_dist2($"a", $"b").as("d"),
        cosine_similarity($"a", $"b").as("c"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) == 5.0 && !rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2),
      s"null element must null the result: ${rows(1)}")
  }
}
