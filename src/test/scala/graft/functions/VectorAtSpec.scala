package graft.functions

import graft.SparkSuite
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._

/** [[VectorAt]]: codegen element access into ml vectors agrees with
  * `Vector.apply` for every in-range index over dense AND sparse
  * layouts (absent sparse slots → 0.0), returns null out of range,
  * and keeps Spark SQL's NaN ordering under `<=` — the CART routing
  * contract (VERDICT r17 #7 + the ADVICE r17 NaN finding).
  */
class VectorAtSpec extends SparkSuite {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Vectors.dense(1.5, 0.0, -2.25, 7.0)),
    (1L, Vectors.sparse(4, Array(1, 3), Array(4.5, -0.125))),
    (2L, Vectors.sparse(4, Array(), Array())),
    (3L, Vectors.sparse(4, Array(0, 1, 2, 3), Array(1, 2, 3, 4)))
  ).toDF("id", "v")

  test("vector_at equals the UDF twin at every in-range index, " +
      "dense and sparse") {
    val twin = udf { (v: Vector, i: Int) => v(i) }
    for (i <- 0 until 4) {
      val rows = vecs.select(
        vector_at($"v", lit(i)).as("native"),
        twin($"v", lit(i)).as("udf")).as[(Double, Double)].collect()
      rows.foreach { case (n, u) =>
        assert(java.lang.Double.doubleToLongBits(n)
          == java.lang.Double.doubleToLongBits(u), s"i=$i: $n != $u")
      }
    }
  }

  test("absent sparse slot reads 0.0, not codegen's -1.0 default") {
    val out = vecs.filter($"id" === 1L)
      .select(vector_at($"v", lit(0)), vector_at($"v", lit(2)))
      .head
    assert(out.getDouble(0) == 0.0 && out.getDouble(1) == 0.0)
  }

  test("out-of-range index and null vector yield null") {
    val out = vecs.select(
      vector_at($"v", lit(4)), vector_at($"v", lit(-1))).collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    val withNull = Seq((0L, Option.empty[Vector])).toDF("id", "v")
    assert(withNull.select(vector_at($"v", lit(0))).head.isNullAt(0))
  }

  test("comparisons keep Spark SQL NaN ordering (NaN > every double)") {
    val df = Seq(Tuple1(Vectors.dense(Double.NaN, 1.0))).toDF("v")
    val r = df.select(
      (vector_at($"v", lit(0)) <= lit(5.0)).as("nan_le_5"),
      (vector_at($"v", lit(1)) <= lit(Double.NaN)).as("one_le_nan"))
      .head
    // SQL ordering: NaN is greatest, so NaN <= 5 is false and
    // 1 <= NaN is TRUE — the pre-r17 when-chain routing semantics
    // (a Scala IEEE comparison would return false for both)
    assert(!r.getBoolean(0) && r.getBoolean(1))
  }

  test("interpreted eval agrees with codegen output") {
    // route through an interpreted context: eval() directly
    val sparse = Vectors.sparse(6, Array(2, 5), Array(9.5, -1.0))
    val udt = org.apache.spark.ml.linalg.SQLDataTypes.VectorType
      .asInstanceOf[org.apache.spark.sql.types.UserDefinedType[Vector]]
    val row = udt.serialize(sparse)
    val lits = (i: Int) =>
      org.apache.spark.sql.catalyst.expressions.Literal(i)
    val vlit = org.apache.spark.sql.catalyst.expressions.Literal(
      row, org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
    for (i <- 0 until 6) {
      val got = VectorAt(vlit, lits(i)).eval(null)
      assert(got == sparse(i), s"i=$i: $got != ${sparse(i)}")
    }
    assert(VectorAt(vlit, lits(6)).eval(null) == null)
    assert(VectorAt(vlit, lits(-1)).eval(null) == null)
  }
}
