package graft.functions

import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native element access into an ml `Vector` column —
  * `vector_at(vec, i)` (VERDICT r17 #7).
  *
  * Why not a UDF: ml `Vector` element access has no Catalyst builtin,
  * so every site that needs one element (CART's per-level routing,
  * threshold probes over featurized columns) previously paid a full
  * UDT deserialization — the whole indices/values payload copied into
  * a `SparseVector` object per row — plus the codegen fence a Scala
  * UDF erects around its operator. This expression reads the single
  * element straight out of the unsafe row (`VectorUDT` layout:
  * `(type: byte, size: int, indices: array<int>, values:
  * array<double>)`, type 1 = dense, 0 = sparse), binary-searching the
  * sparse indices, and stays inside whole-stage codegen.
  *
  * Semantics match `org.apache.spark.ml.linalg.Vector.apply` for
  * in-range indices (absent sparse slot → 0.0); an out-of-range index
  * yields NULL (the SQL `element_at`-under-ansi=false convention)
  * rather than an exception, so a bad index surfaces as a null count,
  * not a task storm. Comparisons on the result use Spark SQL's NaN
  * ordering (NaN greater than every double), which is exactly the
  * point for CART: routing regains the ORIGINAL SQL `<=` semantics
  * the r17 map-lookup UDF had quietly swapped for Scala's
  * IEEE-false-on-NaN comparison (ADVICE r17).
  */
case class VectorAt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_at"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (t, IntegerType) if t == SQLDataTypes.VectorType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (vector, int) inputs, got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(vec: Any, idx: Any): Any = {
    val row = vec.asInstanceOf[InternalRow]
    val i = idx.asInstanceOf[Int]
    if (row.getByte(0) == 1.toByte) { // dense
      val values = row.getArray(3)
      if (i < 0 || i >= values.numElements()) null
      else values.getDouble(i)
    } else { // sparse
      if (i < 0 || i >= row.getInt(1)) null
      else {
        val indices = row.getArray(2)
        val values = row.getArray(3)
        var lo = 0
        var hi = indices.numElements() - 1
        var out = 0.0
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val cur = indices.getInt(mid)
          if (cur == i) { out = values.getDouble(mid); lo = hi + 1 }
          else if (cur < i) lo = mid + 1
          else hi = mid - 1
        }
        out
      }
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, i) => {
      val arrCls = classOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .getName
      val vals = ctx.freshName("vals")
      val idxs = ctx.freshName("idxs")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val cur = ctx.freshName("cur")
      s"""
        if ($v.getByte(0) == (byte) 1) {
          $arrCls $vals = $v.getArray(3);
          if ($i < 0 || $i >= $vals.numElements()) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $vals.getDouble($i);
          }
        } else {
          if ($i < 0 || $i >= $v.getInt(1)) {
            ${ev.isNull} = true;
          } else {
            $arrCls $idxs = $v.getArray(2);
            $arrCls $vals = $v.getArray(3);
            ${ev.value} = 0.0; // absent sparse slot (codegen's
            // uninitialized default is -1.0, not 0.0)
            int $lo = 0;
            int $hi = $idxs.numElements() - 1;
            while ($lo <= $hi) {
              int $mid = ($lo + $hi) >>> 1;
              int $cur = $idxs.getInt($mid);
              if ($cur == $i) { ${ev.value} = $vals.getDouble($mid); break; }
              else if ($cur < $i) { $lo = $mid + 1; }
              else { $hi = $mid - 1; }
            }
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorAt =
    copy(left = newLeft, right = newRight)
}
