package graft.functions

import org.apache.spark.ml.linalg.{SQLDataTypes, Vector, Vectors}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.UserDefinedType
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the ml-vector Catalyst kernels: for ARBITRARY
  * sparse/dense vectors (including explicit zero slots, empty
  * vectors, negative and denormal values) the interpreted eval path
  * must agree with `org.apache.spark.ml.linalg.Vector` semantics —
  * `apply(i)` for [[VectorAt]], `foreachActive` + the x != 0 filter
  * for [[VectorNonzeros]], the elementwise product for
  * [[VectorScale]]. Codegen/eval agreement is pinned separately by
  * VectorAtSpec/VectorKernelsSpec on a live session; these
  * properties cover the input space.
  */
object VectorKernelProps extends Properties("VectorKernels") {

  private val udt =
    SQLDataTypes.VectorType.asInstanceOf[UserDefinedType[Vector]]

  private def serialize(v: Vector): InternalRow =
    udt.serialize(v).asInstanceOf[InternalRow]

  private val value: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e6, 1e6),
    Gen.oneOf(0.0, 1.0, -1.0, 1e-300, -1e-300))

  private val denseVec: Gen[Vector] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, value).map(vs => Vectors.dense(vs.toArray)))

  private val sparseVec: Gen[Vector] = for {
    size <- Gen.chooseNum(0, 16)
    idx <- Gen.someOf(0 until size)
    vs <- Gen.listOfN(idx.size, value) // may include explicit zeros
  } yield Vectors.sparse(size, idx.toArray.sorted, vs.toArray)

  private val anyVec: Gen[Vector] = Gen.oneOf(denseVec, sparseVec)

  property("vector_at(i) == Vector.apply(i) for every in-range i") =
    forAll(anyVec) { v =>
      val lit = Literal(serialize(v), SQLDataTypes.VectorType)
      (0 until v.size).forall { i =>
        val got = VectorAt(lit, Literal(i)).eval(null)
        java.lang.Double.doubleToLongBits(got.asInstanceOf[Double]) ==
          java.lang.Double.doubleToLongBits(v(i))
      }
    }

  property("vector_at out of range is null") = forAll(anyVec) { v =>
    val lit = Literal(serialize(v), SQLDataTypes.VectorType)
    VectorAt(lit, Literal(v.size)).eval(null) == null &&
      VectorAt(lit, Literal(-1)).eval(null) == null
  }

  property("vector_nonzeros == foreachActive filtered to x != 0, " +
      "in index order") = forAll(anyVec) { v =>
    val lit = Literal(serialize(v), SQLDataTypes.VectorType)
    val got = VectorNonzeros(lit).eval(null).asInstanceOf[ArrayData]
    val pairs = (0 until got.numElements()).map { i =>
      val r = got.getStruct(i, 2)
      (r.getInt(0), r.getDouble(1))
    }
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    v.foreachActive((i, x) => if (x != 0.0) expected += ((i, x)))
    pairs == expected.toSeq
  }

  property("vector_scale == elementwise product, layout preserved") =
    forAll(anyVec) { v =>
      val w = Array.tabulate(math.max(v.size, 1))(i => 0.5 + i * 0.25)
      val lit = Literal(serialize(v), SQLDataTypes.VectorType)
      val got = udt.deserialize(
        VectorScale(lit, w).eval(null).asInstanceOf[InternalRow])
      val sameLayout = got.getClass == v.getClass
      val sameValues = (0 until v.size).forall { i =>
        java.lang.Double.doubleToLongBits(got(i)) ==
          java.lang.Double.doubleToLongBits(v(i) * w(i))
      }
      sameLayout && sameValues
    }

  property("vector_from_floats round-trips float arrays") =
    forAll(Gen.chooseNum(0, 12).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-1e5f, 1e5f)))) { fs =>
      val child = Literal.create(fs.toArray,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false))
      val got = udt.deserialize(
        VectorFromFloats(child).eval(null).asInstanceOf[InternalRow])
      got == Vectors.dense(fs.map(_.toDouble).toArray)
    }
}
