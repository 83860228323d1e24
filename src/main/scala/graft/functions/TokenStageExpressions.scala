package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused native kernels for the ML-pipeline token stages (F5+F6 and
  * F8+F9). The column-function formulations in [[TextFunctions]] are
  * semantically identical but run as interpreted array higher-order
  * functions — measured at ~150 s for one pass over the 59,946-doc
  * flagship corpus (9M tokens) at local[4], dominated by per-element
  * interpreter dispatch, Matcher allocation, and UTF8String↔String
  * copies. Each kernel here is one compiled loop per row.
  *
  * Kept in plain objects (no companion class) so janino-generated code
  * reaches them through static forwarders.
  */
object TokenizeLower {

  private val splitPat = Pattern.compile("[^\\p{L}\\p{N}']+")
  private val numPat = Pattern.compile("^[\\p{N}][\\p{N}.,]*$")

  /** quanteda-style word tokenization + lower-casing (F5+F6): split on
    * non-letter/digit/apostrophe runs, drop empties and pure-number
    * tokens (checked on the RAW token, like the column formulation),
    * lower-case via UTF8String (bit-identical to Spark's `lower`).
    */
  def apply(s: UTF8String): ArrayData = {
    val parts = splitPat.split(s.toString, -1)
    val out = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty && !numPat.matcher(p).matches())
        out.add(UTF8String.fromString(p).toLowerCase)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object IcuTokenizeLower {

  private val numPat = Pattern.compile("^[\\p{N}][\\p{N}.,]*$")

  // BreakIterator instances are stateful and not thread-safe; one per
  // executor thread, reused across rows (allocation is the expensive
  // part — setText is cheap).
  private val iter = new ThreadLocal[java.text.BreakIterator] {
    override def initialValue(): java.text.BreakIterator =
      java.text.BreakIterator.getWordInstance(java.util.Locale.ROOT)
  }

  private def wordlike(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) return true
      i += Character.charCount(cp)
    }
    false
  }

  /** ICU-style word tokenization + lower-casing — the F5 fidelity
    * mode (SURVEY §8 H1): JDK `BreakIterator` word segmentation
    * (UAX#29, the same spec family as quanteda's ICU tokenizer)
    * instead of the regex split, closing the boundary divergences the
    * regex approximation documents:
    *
    *  - intra-word hyphens stay intact ("mid-century" is ONE token —
    *    the reference transcript's all.tokens[[357]] anchor shows
    *    quanteda 3.x keeps hyphenated words whole; `remove_hyphens`
    *    was already deprecated-and-ignored in the recorded run),
    *    rebuilt here by re-joining a bare "-" segment whose adjacent
    *    segments are both words (UAX#29 emits hyphens as their own
    *    segment);
    *  - grouped numbers segment as one token ("100,000"), then drop
    *    under remove_numbers like quanteda's number class;
    *  - punctuation/symbol segments (";)", "—") drop — a token
    *    survives only if it contains a letter or digit.
    *
    * Apostrophes ride UAX#29 MidLetter ("don't" is one token), same
    * as the regex mode's apostrophe carve-out.
    */
  def apply(s: UTF8String): ArrayData = {
    val text = s.toString
    val bi = iter.get()
    bi.setText(text)
    // collect the boundary-partitioned segments once
    val segs = new java.util.ArrayList[String]()
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      segs.add(text.substring(start, end))
      start = end
      end = bi.next()
    }
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = segs.size()
    while (i < n) {
      val seg = segs.get(i)
      if (wordlike(seg)) {
        // greedily extend over "-"+word pairs: segments partition the
        // text, so adjacency in the list IS character adjacency
        val tok = new java.lang.StringBuilder(seg)
        while (i + 2 < n && segs.get(i + 1) == "-" &&
            wordlike(segs.get(i + 2))) {
          tok.append('-').append(segs.get(i + 2))
          i += 2
        }
        val t = tok.toString
        if (!numPat.matcher(t).matches())
          out.add(UTF8String.fromString(t).toLowerCase)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object StemPrune {

  /** Porter2 stem then single-char [a-z] pruning (F8+F9), checked on
    * the STEMMED token like the column formulation.
    */
  def apply(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) {
        // like transform+filter: stem(null) = null, and a null filter
        // predicate drops the element
      } else {
        val stemmed = Porter2.stem(t.toString)
        val single = stemmed.length == 1 && {
          val c = stemmed.charAt(0); c >= 'a' && c <= 'z'
        }
        if (!single) out.add(UTF8String.fromString(stemmed))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object StopwordCount {

  /** Snowball stopwords as a UTF8String hash set, built once per JVM —
    * the same hashed-membership shape `isin` compiles to (InSet). The
    * HOF formulation this replaces (`filter(toks, t =>
    * array_contains(stops, t))`) ran interpreted and re-scanned a
    * 175-element literal array per token — the engine's own documented
    * anti-pattern (see TextQueries' q_pipeline_tokens note).
    */
  private val stops: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](512)
    TextFunctions.snowballStopWords
      .foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Number of array elements that are Snowball stopwords (null
    * elements don't count, like the filter-with-null-predicate HOF).
    */
  def apply(arr: ArrayData): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null && stops.contains(t)) c += 1
      i += 1
    }
    c
  }
}

/** `string → array<string>` tokenize+lower as a codegen expression. */
case class TokenizeLowerExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_lower"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    TokenizeLower(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeLower.apply($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenizeLowerExpression = copy(child = newChild)
}

/** `string → array<string>` ICU-mode tokenize+lower as a codegen
  * expression ([[IcuTokenizeLower]] — BreakIterator word
  * segmentation; the F5 fidelity mode).
  */
case class IcuTokenizeLowerExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "icu_tokenize_lower"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    IcuTokenizeLower(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IcuTokenizeLower.apply($c)")

  override protected def withNewChildInternal(
      newChild: Expression): IcuTokenizeLowerExpression = copy(child = newChild)
}

/** `array<string> → int` Snowball-stopword count as a codegen
  * expression — one compiled loop per row over a static hash set.
  */
case class StopwordCountExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    StopwordCount(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StopwordCount.apply($c)")

  override protected def withNewChildInternal(
      newChild: Expression): StopwordCountExpression = copy(child = newChild)
}

/** `array<string> → array<string>` stem+prune as a codegen expression. */
case class StemPruneExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "stem_prune"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    StemPrune(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StemPrune.apply($c)")

  override protected def withNewChildInternal(
      newChild: Expression): StemPruneExpression = copy(child = newChild)
}
