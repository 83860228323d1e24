package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared scaffolding for the fused binary embedding kernels
  * ([[CosineSimilarity]], [[EuclideanDist2]]) — ONE definition of the
  * type check, element accessor selection, and the two hardening
  * rules both kernels must apply in lockstep (a previous revision
  * duplicated 18 identical lines per kernel, which is exactly how a
  * one-sided fix diverges silently):
  *
  *  - MISMATCHED LENGTHS RAISE. `zip_with` null-pads and yields null;
  *    the sibling ElementwiseMin aggregate raises; a kernel that
  *    silently scores the common prefix of a 384-dim query against a
  *    768-dim corpus (wrong model version in one table) corrupts
  *    every kNN result while looking plausible. Loud beats wrong.
  *  - NULL ELEMENTS PROPAGATE NULL (the higher-order-function
  *    formulation's semantics this kernel claims bit-identity with):
  *    parquet-derived arrays default to containsNull=true, and
  *    reading a null slot as 0.0 silently mis-scores the row. The
  *    per-element null branch is generated ONLY when a side's
  *    element type is actually nullable — non-nullable inputs keep
  *    the tight two-access loop.
  */
trait BinaryVectorFold extends BinaryExpression {

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  protected def anyElemNullable: Boolean =
    elemNullable(left) || elemNullable(right)

  // a null ELEMENT nulls the result even when both array values are
  // non-null, so element nullability widens the expression's
  override def nullable: Boolean =
    left.nullable || right.nullable || anyElemNullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def requireSameLength(a: ArrayData, b: ArrayData): Unit = {
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: mismatched embedding lengths " +
          s"${a.numElements()} vs ${b.numElements()} — refusing to " +
          "silently score the common prefix")
  }

  /** Java source for the codegen length guard. */
  protected def lengthGuardCode(a: String, b: String): String =
    s"""
      if ($a.numElements() != $b.numElements()) {
        throw new IllegalArgumentException(
          "$prettyName: mismatched embedding lengths " +
          $a.numElements() + " vs " + $b.numElements() +
          " - refusing to silently score the common prefix");
      }
    """
}
