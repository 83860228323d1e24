package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonicalization step a multilingual ingest needs BEFORE any
  * hashing/dedup/shingling: "é" arrives both precomposed (U+00E9)
  * and decomposed (e + U+0301), and every content-hash operator in
  * this engine (exact dedup, MinHash, fingerprints, span hashes)
  * would treat the two as different documents. Spark ships no
  * normalizer builtin; a Scala UDF would fall out of whole-stage
  * codegen, so this is a real `Expression` wrapping
  * `java.text.Normalizer` (the JDK's ICU-derived implementation —
  * public API, same NFC tables DuckDB's `nfc_normalize` applies).
  *
  * The fast path costs one `Normalizer.isNormalized` scan per row —
  * for the overwhelmingly-NFC real corpus the allocation-free check
  * is all that runs, and already-normalized input is returned
  * as-is (same UTF8String reference, zero copies).
  */
object NfcNormalize {
  /** Static entry for both eval paths; `s` non-null. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    Bridge.column(NfcNormalizeExpression(Bridge.expression(c)))
}

case class NfcNormalizeExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpression =
    copy(child = newChild)
}
