package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData

/** Native cosine similarity over two embedding arrays
  * (array<float> or array<double>), accumulated in double.
  *
  * A real Catalyst `BinaryExpression` with `doGenCode`: one fused loop
  * computing dot product and both norms, inside whole-stage codegen.
  * The `zip_with`/`aggregate` higher-order-function formulation is
  * semantically identical but interpreted (HOFs don't codegen) and
  * allocates an intermediate array per row — on a 100 TB scan the
  * difference is the scan rate. Accumulation order matches the HOF
  * fold (sequential), so results are bit-identical to the previous
  * formulation and to the DuckDB oracles. Length-mismatch and
  * null-element hardening: [[BinaryVectorFold]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryVectorFold {

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    requireSameLength(a, b)
    val n = a.numElements()
    val aF = elemIsFloat(left); val bF = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      // the null-element branch exists only when a side's element
      // type is nullable — non-nullable inputs keep the tight loop
      val nullCheck =
        if (anyElemNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
                ${ev.isNull} = true; break;
              }"""
        else ""
      s"""
        ${lengthGuardCode(a, b)}
        int $n = $a.numElements();
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $nullCheck
          double $x = (double) $a.$aGet($i);
          double $y = (double) $b.$bGet($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        if (!${ev.isNull}) {
          ${ev.value} = $dot /
            (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
