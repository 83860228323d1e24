package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT word k-gram shingles of a token array, space-joined, in
  * first-occurrence order — the native replacement for the shingle
  * UDFs that fronted every dedup chain (round 19): `shingleSets`
  * feeds MinHash/LSH, exact-Jaccard, calibration, the operating-point
  * sweep and both leakage-safe splits, so the per-row cost here is
  * the dedup family's scan tax. The UDF paid, per row, an
  * ArrayData → Seq[String] encoder conversion, a Scala `sliding`
  * iterator with per-window Seq allocation, and the codegen fence;
  * this kernel walks the raw `ArrayData` once and builds each
  * shingle with a single `UTF8String.concatWs` allocation, inside
  * whole-stage codegen.
  *
  * Contract (identical to the UDFs replaced): null or shorter-than-k
  * input → EMPTY array, never null (`nullable` = false); duplicate
  * shingles collapse to their first occurrence; a (schema-permitted,
  * never produced by `split`) null token renders as the literal
  * "null", matching Scala `mkString`. NOT the nested transform/slice
  * formulation — referencing a computed array inside its own lambda
  * makes Catalyst re-evaluate it per element (quadratic,
  * interpreted); see Dedup's scale notes.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> input, got " +
          other.simpleString(10))
    }

  private val sep = UTF8String.fromString(" ")
  private val nullToken = UTF8String.fromString("null")
  private val empty = new GenericArrayData(Array.empty[Any])

  /** Public row kernel — called from both eval and generated code.
    * Accepts null (the UDF contract: null tokens → no shingles).
    */
  def kernel(arr: ArrayData): ArrayData = {
    if (arr == null) return empty
    val n = arr.numElements()
    if (n < k) return empty
    // read tokens once; concatWs allocates fresh bytes per shingle,
    // so transient unsafe-backed token handles are never retained
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) nullToken else t
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](k)
    i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { window(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, window: _*))
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    seen.toArray(out)
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    kernel(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordShingles", this,
      classOf[WordShingles].getName)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        |${childGen.code}
        |$javaType ${ev.value} =
        |  $self.kernel(${childGen.isNull} ? null : ${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

/** 64-bit SimHash over a token multiset (FNV-1a 64 per token, weight
  * = occurrence count, majority vote per bit) — native replacement
  * for the `simhash64` UDF (round 19), bit-identical by construction:
  * the same UTF-16 code-unit FNV loop over each token, the same
  * majority fold. Null or empty input → 0L, never null (the UDF
  * contract: an all-zero accumulator votes every bit off). A
  * (schema-permitted, never produced) null token contributes nothing,
  * matching the UDF's NPE-free Seq path where `split` never yields
  * nulls.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> input, got " +
          other.simpleString(10))
    }

  /** Public row kernel — called from both eval and generated code. */
  def kernel(arr: ArrayData): Long = {
    val acc = new Array[Long](64)
    if (arr != null) {
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val u = arr.getUTF8String(i)
        if (u != null) {
          // the UDF hashed java.lang.String UTF-16 code units; keep
          // that exact lattice (toString is the per-token cost the
          // encoder paid for the WHOLE array before)
          val t = u.toString
          var h = 0xcbf29ce484222325L // FNV-1a 64
          var j = 0
          while (j < t.length) {
            h ^= t.charAt(j); h *= 0x100000001b3L; j += 1
          }
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
        i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override def eval(input: InternalRow): Any =
    kernel(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHash64", this,
      classOf[SimHash64].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code}
        |long ${ev.value} =
        |  $self.kernel(${childGen.isNull} ? null : ${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}
