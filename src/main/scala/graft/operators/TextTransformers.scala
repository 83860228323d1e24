package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MLlib-pipeline wrappers around the engine's column-level text
  * primitives (graft.functions.TextFunctions), so the reference's
  * cleaning chain (SURVEY §2.4, F1-F9) composes as `Pipeline` stages
  * with the vectorizer/classifier stages. Each stage is a pure column
  * expression — whole-stage codegen, no UDFs except the stemmer's
  * native expression.
  */
abstract class ColumnTransformer(override val uid: String)
    extends Transformer with DefaultParamsWritable {
  final val inputCol = new Param[String](this, "inputCol", "input column")
  final val outputCol = new Param[String](this, "outputCol", "output column")
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  /** The column expression this stage applies. */
  protected def expression(in: Column): Column
  protected def outputType: DataType

  override def transform(ds: Dataset[_]): DataFrame =
    ds.withColumn($(outputCol), expression(col($(inputCol))))
  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), outputType, nullable = true)
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}

/** F3+F4: HTML strip then custom stop-word strip (case-sensitive,
  * single-pass — quirk Q5).
  */
class RegexCleaner(uid: String) extends ColumnTransformer(uid) {
  def this() = this(Identifiable.randomUID("regexCleaner"))
  protected def expression(in: Column): Column =
    TextFunctions.stripCustomStopWords(TextFunctions.cleanHtml(in))
  protected def outputType: DataType = StringType
}

object RegexCleaner extends DefaultParamsReadable[RegexCleaner]

/** F5+F6: word tokenization + lower-casing → array<string>. Two
  * modes, both fused codegen expressions (one compiled loop per row):
  *
  *  - `"regex"` (default) — [[graft.functions.TokenizeLowerExpression]],
  *    the split-on-`[^\p{L}\p{N}']` approximation every oracle-checked
  *    query pins; the interpreted HOF formulation
  *    (`TextFunctions.tokenizeWords`/`lowerTokens`) computes the same
  *    tokens for ad-hoc column math.
  *  - `"icu"` — [[graft.functions.IcuTokenizeLowerExpression]]: JDK
  *    `BreakIterator` UAX#29 word segmentation, the fidelity mode for
  *    the reference's quanteda/ICU tokenizer (SURVEY §8 H1,
  *    `Week5_datingNLP.R:65-67`): hyphenated words stay whole
  *    ("mid-century" — the out.txt all.tokens[[357]] anchor), grouped
  *    numbers drop as one token, punctuation/symbol runs drop.
  *    TokenStageSpec pins the doc-357-style fixture where the two
  *    modes diverge.
  */
class WordTokenizer(uid: String) extends ColumnTransformer(uid) {
  def this() = this(Identifiable.randomUID("wordTokenizer"))
  final val mode = new Param[String](this, "mode",
    "tokenizer mode: regex (default) or icu",
    (v: String) => v == "regex" || v == "icu")
  setDefault(mode, "regex")
  def setMode(v: String): this.type = set(mode, v)
  protected def expression(in: Column): Column =
    if ($(mode) == "icu") graft.functions.icu_tokenize_lower(in)
    else graft.functions.tokenize_lower(in)
  protected def outputType: DataType = ArrayType(StringType)
}

object WordTokenizer extends DefaultParamsReadable[WordTokenizer]

/** F7: Snowball English stop-word removal (the 175-word quanteda
  * default, not Spark's 181-word list). Delegates to Spark's
  * `StopWordsRemover`, whose hash-set membership test beats the
  * interpreted `array_contains(literal-array)` scan by ~175×;
  * caseSensitive because the stream is already lower-cased (F6).
  */
object SnowballStopWords {
  def apply(): org.apache.spark.ml.feature.StopWordsRemover =
    new org.apache.spark.ml.feature.StopWordsRemover()
      .setStopWords(TextFunctions.snowballStopWords.toArray)
      .setCaseSensitive(true)
}

/** F8+F9: Porter2 stemming then single-char token removal. Backed by
  * the fused native [[graft.functions.StemPruneExpression]] (same
  * semantics as `removeSingleChar(stemTokens(in))`, one compiled loop).
  */
class PorterStemmer(uid: String) extends ColumnTransformer(uid) {
  def this() = this(Identifiable.randomUID("porterStemmer"))
  protected def expression(in: Column): Column =
    graft.functions.stem_prune(in)
  protected def outputType: DataType = ArrayType(StringType)
}

object PorterStemmer extends DefaultParamsReadable[PorterStemmer]
