package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** The fused token-stage expressions must be drop-in equivalents of
  * the column-function formulations they replace on the ML-pipeline
  * path (F5+F6, F8+F9).
  */
class TokenStageSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    "The quick brown-fox jumps over 42 lazy dogs",
    "don't stop believing  'hold on to that feeling'",
    "3.14 1,000 99 intellectually dancing houses a b c",
    "",
    "   ",
    "café résumés naïve é Mixed CASE Words",
    "numbers123 123numbers 1a2b3c ''",
    "a-b-c d--e  f'g'h"
  ).toDF("text")

  test("tokenize_lower == lowerTokens(tokenizeWords)") {
    val fused = docs.select(tokenize_lower(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    val hof = docs.select(
      TextFunctions.lowerTokens(
        TextFunctions.tokenizeWords(col("text"))).as("t"))
      .collect().map(_.getSeq[String](0))
    fused.zip(hof).foreach { case (a, b) => assert(a == b) }
  }

  test("stem_prune == removeSingleChar(stemTokens)") {
    val tokens = docs.select(
      TextFunctions.lowerTokens(
        TextFunctions.tokenizeWords(col("text"))).as("t"))
    val fused = tokens.select(stem_prune(col("t")).as("s"))
      .collect().map(_.getSeq[String](0))
    val hof = tokens.select(
      TextFunctions.removeSingleChar(
        TextFunctions.stemTokens(col("t"))).as("s"))
      .collect().map(_.getSeq[String](0))
    fused.zip(hof).foreach { case (a, b) => assert(a == b) }
  }

  test("icu_tokenize_lower reproduces the quanteda doc-357 anchors " +
      "where the regex mode diverges (F5/H1)") {
    // The reference transcript's all.tokens[[357]] (out.txt:1) keeps
    // "mid-century" as ONE token — quanteda 3.x ICU segmentation
    // ignores the deprecated remove_hyphens flag. The regex mode
    // splits it; the BreakIterator mode must not. Same fixture also
    // pins grouped-number drop (one ICU number token, not two
    // digit-runs), punct/symbol-run drop, and apostrophe cohesion.
    val fixture = Seq(
      "Identify harpsichords, mid-century furniture ;) 42 and " +
        "100,000 things I don't KNOW"
    ).toDF("text")
    val icu = fixture.select(icu_tokenize_lower(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    assert(icu == Seq("identify", "harpsichords", "mid-century",
      "furniture", "and", "things", "i", "don't", "know"),
      s"icu mode: $icu")
    val regex = fixture.select(tokenize_lower(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    // the documented divergence the icu mode closes:
    assert(regex.contains("mid") && regex.contains("century") &&
      !regex.contains("mid-century"), s"regex mode: $regex")
  }

  test("icu_tokenize_lower: multi-hyphen words, spaced hyphens, " +
      "double hyphens") {
    val rows = Seq(
      "state-of-the-art",
      "well - known",     // spaced hyphen: no join
      "before--after",    // double hyphen: no join
      "x 3-4 y"           // hyphenated digits: kept (not a pure number)
    ).toDF("text")
    val out = rows.select(icu_tokenize_lower(col("text")).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(out(0) == Seq("state-of-the-art"), s"${out(0)}")
    assert(out(1) == Seq("well", "known"), s"${out(1)}")
    assert(out(2) == Seq("before", "after"), s"${out(2)}")
    assert(out(3) == Seq("x", "3-4", "y"), s"${out(3)}")
  }

  test("WordTokenizer mode param selects the kernel; regex stays " +
      "the default") {
    import graft.operators.WordTokenizer
    val fixture = Seq("mid-century modern").toDF("text")
    val regexOut = new WordTokenizer()
      .setInputCol("text").setOutputCol("t")
      .transform(fixture).collect().head.getSeq[String](1)
    assert(regexOut == Seq("mid", "century", "modern"))
    val icuOut = new WordTokenizer().setMode("icu")
      .setInputCol("text").setOutputCol("t")
      .transform(fixture).collect().head.getSeq[String](1)
    assert(icuOut == Seq("mid-century", "modern"))
  }

  test("q_tokenize_icu's pinned suffix tokens match the ICU kernel " +
      "— the literal the oracle replays verbatim") {
    // The q_tokenize_icu oracle cannot segment in DuckDB; it replays
    // TextQueries.icuSuffixTokens as a constant list. This pin makes
    // the constant a THEOREM about the kernel rather than a copy:
    // if either the suffix or the segmenter changes, this fails
    // before the cross-engine hash does.
    val got = Seq(graft.queries.TextQueries.icuSuffix).toDF("text")
      .select(icu_tokenize_lower(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    assert(got == graft.queries.TextQueries.icuSuffixTokens,
      s"kernel: $got\npinned: ${graft.queries.TextQueries.icuSuffixTokens}")
    // and the raw-text half of the query really is a space split on
    // the fixture alphabet: ICU over [a-z ]-only text = split
    val plain = Seq("key agg row scan").toDF("text")
      .select(icu_tokenize_lower(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    assert(plain == Seq("key", "agg", "row", "scan"))
  }
}
