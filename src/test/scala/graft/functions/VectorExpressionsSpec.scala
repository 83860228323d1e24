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

  // min-length truncation (CosineSimilarity's convention) rather than
  // zip_with's null-padded max-length: mismatched dims are a caller
  // bug; the operators only ever compare equal-dimension embeddings
  test("euclidean_dist2 truncates to the shorter array") {
    val df = Seq((Seq(1.0, 2.0, 9.0), Seq(2.0, 4.0)))
      .toDF("a", "b")
    assert(df.select(euclidean_dist2($"a", $"b"))
      .head().getDouble(0) == 5.0)
  }
}
