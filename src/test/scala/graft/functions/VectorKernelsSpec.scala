package graft.functions

import graft.SparkSuite
import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector, Vectors}
import org.apache.spark.sql.functions._

/** [[VectorNonzeros]] and [[VectorScale]] agree bit-for-bit with the
  * UDF formulations they replaced (DeterministicCart's stats pass,
  * Log10IDFModel.transform), preserve sparse/dense layout, and filter
  * explicit zeros exactly like `foreachActive` + the x != 0 guard.
  */
class VectorKernelsSpec extends SparkSuite {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Vectors.dense(1.5, 0.0, -2.25, 7.0)),
    (1L, Vectors.sparse(4, Array(1, 3), Array(4.5, -0.125))),
    // explicit zero in a sparse vector: must be filtered like the
    // UDF's x != 0.0 guard
    (2L, Vectors.sparse(4, Array(0, 2), Array(0.0, 3.5))),
    (3L, Vectors.sparse(4, Array(), Array())),
    (4L, Vectors.dense(0.0, 0.0, 0.0, 0.0))
  ).toDF("id", "v")

  test("vector_nonzeros equals the tuple-UDF twin on every layout") {
    val twin = udf { v: Vector =>
      val b = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      v.foreachActive((i, x) => if (x != 0.0) b += ((i, x)))
      b.toSeq
    }
    val rows = vecs.select(
      vector_nonzeros($"v").as("native"), twin($"v").as("udf"))
      .as[(Seq[(Int, Double)], Seq[(Int, Double)])].collect()
    rows.foreach { case (n, u) => assert(n === u) }
    // and the struct field names match the UDF's tuple encoding —
    // CART reads e._1/e._2
    val fields = vecs.select(explode(vector_nonzeros($"v")).as("e"))
      .select(col("e._1"), col("e._2")).columns.toSeq
    assert(fields === Seq("_1", "_2"))
  }

  test("vector_scale equals the UDF twin bit-for-bit and preserves " +
      "layout") {
    val w = Array(0.35, 0.589, 1.362, 2.0)
    val twin = udf { v: Vector =>
      v match {
        case sv: SparseVector =>
          val vals = new Array[Double](sv.values.length)
          var i = 0
          while (i < vals.length) {
            vals(i) = sv.values(i) * w(sv.indices(i)); i += 1
          }
          Vectors.sparse(sv.size, sv.indices, vals): Vector
        case dv: DenseVector =>
          val vals = new Array[Double](dv.values.length)
          var i = 0
          while (i < vals.length) { vals(i) = dv.values(i) * w(i); i += 1 }
          Vectors.dense(vals): Vector
      }
    }
    val rows = vecs.select($"id",
      vector_scale($"v", w).as("native"), twin($"v").as("udf"))
      .collect()
    rows.foreach { r =>
      val n = r.getAs[Vector](1)
      val u = r.getAs[Vector](2)
      assert(n.getClass === u.getClass,
        s"id=${r.getLong(0)}: layout changed")
      assert(n === u, s"id=${r.getLong(0)}")
      n.toArray.zip(u.toArray).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a)
          == java.lang.Double.doubleToLongBits(b))
      }
    }
  }

  test("null vectors propagate null through both kernels") {
    val withNull = Seq((0L, Option.empty[Vector])).toDF("id", "v")
    val out = withNull.select(
      vector_nonzeros($"v"), vector_scale($"v", Array(1.0))).head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("vector_from_floats equals the UDF twin on float and double " +
      "arrays and propagates null") {
    val twin = udf { arr: Seq[Float] =>
      if (arr == null) null
      else Vectors.dense(arr.map(_.toDouble).toArray)
    }
    val floats = Seq(
      (0L, Some(Array(1.5f, -0.25f, 0.0f))),
      (1L, Option.empty[Array[Float]])).toDF("id", "a")
    val out = floats.select($"id",
      vector_from_floats($"a").as("native"), twin($"a").as("udf"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(1))
      else {
        val n = r.getAs[Vector](1)
        assert(n.isInstanceOf[org.apache.spark.ml.linalg.DenseVector])
        assert(n === r.getAs[Vector](2))
      }
    }
    val doubles = Seq(Tuple1(Array(2.5, -1.0))).toDF("a")
    assert(doubles.select(vector_from_floats($"a")).head.getAs[Vector](0)
      === Vectors.dense(2.5, -1.0))
  }

  test("vector_from_floats raises on a null ELEMENT instead of " +
      "silently zeroing the dimension (ADVICE r18)") {
    val withNullElem = Seq(
      (0L, Seq[Option[Double]](Some(1.0), None, Some(3.0))))
      .toDF("id", "a")
      .select($"id", $"a".cast("array<double>").as("a"))
    val e = intercept[Exception] {
      withNullElem.select(vector_from_floats($"a")).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("null element")),
      s"expected the loud null-element raise, got: $e")
    // a containsNull=true SCHEMA with null-free data still works —
    // parquet reads arrays nullable-element by default
    val clean = Seq((0L, Seq[Option[Double]](Some(1.0), Some(2.0))))
      .toDF("id", "a")
    assert(clean.select(vector_from_floats($"a")).head.getAs[Vector](0)
      === Vectors.dense(1.0, 2.0))
  }
}
