package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH kernel: all `tables` bucket ids of one
  * embedding in a single pass over its elements.
  *
  * Kept in a plain object (no companion class) so Scala emits static
  * forwarders and janino-generated code can call it as
  * `graft.functions.Hyperplane.buckets(...)`.
  */
object Hyperplane {

  /** splitmix64 finalizer — the projection weights' only state. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random projection weight in (-0.5, 0.5) for
    * (seed, hyperplane index, dimension index) — no stored model.
    */
  def weight(seed: Long, plane: Int, dim: Int): Double =
    ((mix(seed + plane.toLong * 0x100000001b3L + dim.toLong * 0x27d4eb2f165667c5L)
      >>> 11).toDouble / (1L << 53).toDouble) - 0.5

  /** All `tables` bucket ids (packed sign bits of `bits` projections
    * each) for one vector. One fused loop: dims × (bits·tables)
    * multiply-adds, no intermediate arrays per hyperplane.
    */
  def buckets(vec: ArrayData, elemIsFloat: Boolean,
      bits: Int, tables: Int, seed: Long): ArrayData = {
    val nPlanes = bits * tables
    val dots = new Array[Double](nPlanes)
    val n = vec.numElements()
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) {
        // a null element nulls every dot product in the HOF
        // formulation this replaces, and a null `when` predicate falls
        // through to the 0 branch for every sign bit — so a corrupt
        // vector lands in the recognizable all-zero bucket, not an
        // arbitrary one
        return new GenericArrayData(new Array[Long](tables))
      }
      val v = if (elemIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      var p = 0
      while (p < nPlanes) { dots(p) += v * weight(seed, p, i); p += 1 }
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        if (dots(t * bits + b) >= 0) acc |= (1L << b)
        b += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression producing the `array<long>` of LSH bucket
  * ids for an embedding column — replaces the previous formulation of
  * `bits × tables` separate interpreted `zip_with`/`aggregate` passes
  * (HOFs don't codegen and re-allocate per pass; this is one compiled
  * loop per row inside whole-stage codegen).
  */
case class HyperplaneBucketsExpression(
    child: Expression, bits: Int, tables: Int, seed: Long)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")
  require(tables >= 1, s"tables must be >= 1, got $tables")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float|double> input, got " +
            other.simpleString)
    }

  override def nullSafeEval(v: Any): Any =
    Hyperplane.buckets(v.asInstanceOf[ArrayData], elemIsFloat, bits, tables, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hyperplane.buckets($c, $elemIsFloat, $bits, $tables, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBucketsExpression =
    copy(child = newChild)
}
