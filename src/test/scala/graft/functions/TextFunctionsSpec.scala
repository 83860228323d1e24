package graft.functions

import graft.{OkCupidPipeline, SparkSuite}
import org.apache.spark.sql.functions._

/** Cleaning-pipeline behavior on the committed fixture corpus
  * (FIXTURES.md §2): each test pins one reference semantic from
  * SURVEY §2.4.
  */
class TextFunctionsSpec extends SparkSuite {

  private lazy val profiles = OkCupidPipeline.load(spark, fixturePath)
  private lazy val essays = OkCupidPipeline.withEssays(profiles)

  test("S1: multiLine CSV load sees all 24 rows, 31 columns") {
    assert(profiles.count() == 24)
    assert(profiles.columns.length == 31)
  }

  test("snowball stop list has the canonical 175 entries") {
    assert(TextFunctions.snowballStopWords.size == 175)
    assert(TextFunctions.snowballStopWords.distinct.size == 175)
  }

  test("custom stop list is the reference's 31 words") {
    assert(TextFunctions.customStopWords.size == 31)
  }

  test("F3: HTML anchor, entity, <br/>, closing tag all stripped") {
    val cleaned = essays.filter(col("age") === 25)
      .select(TextFunctions.cleanHtml(col("essays"))).head().getString(0)
    assert(!cleaned.contains("<a"))
    assert(!cleaned.contains("&amp;"))
    assert(!cleaned.contains("<br"))
    assert(!cleaned.contains("</b>"))
    assert(cleaned.contains("enjoy"))
  }

  test("F3: standalone class attribute stripped") {
    val cleaned = essays.filter(col("age") === 30)
      .select(TextFunctions.cleanHtml(col("essays"))).head().getString(0)
    assert(!cleaned.contains("class="))
    assert(!cleaned.contains("fancy"))
  }

  test("F4: custom stop strip is case-sensitive (quirk Q5)") {
    val cleaned = essays.filter(col("age") === 28)
      .select(TextFunctions.stripCustomStopWords(col("essays")))
      .head().getString(0)
    // lowercase members stripped...
    assert(!cleaned.matches(".*\\blove\\b.*"))
    assert(!cleaned.matches(".*\\bmy\\b.*"))
    assert(!cleaned.matches(".*\\bbut\\b.*"))
    // ...uppercase variants survive (applied before lower-casing)
    assert(cleaned.contains("I "))
    assert(cleaned.contains("Love"))
    assert(cleaned.contains("CATS"))
  }

  test("F5: numbers dropped, hyphens split") {
    val tokens = essays.filter(col("age") === 26)
      .select(TextFunctions.tokenizeWords(col("essays")))
      .head().getSeq[String](0)
    assert(!tokens.contains("25"))
    assert(!tokens.contains("1999"))
    assert(tokens.contains("years"))
    val hyph = essays.filter(col("age") === 31)
      .select(TextFunctions.tokenizeWords(col("essays")))
      .head().getSeq[String](0)
    assert(hyph.contains("well") && hyph.contains("known"))
    assert(!hyph.exists(_.contains("-")))
  }

  test("F8+F9: stemming then single-char removal") {
    val tokens = essays.filter(col("age") === 27)
      .select(TextFunctions.removeSingleChar(TextFunctions.stemTokens(
        TextFunctions.lowerTokens(
          TextFunctions.tokenizeWords(col("essays"))))))
      .head().getSeq[String](0)
    assert(tokens.contains("intellectu")) // reference-observed stem
    assert(tokens.contains("danc"))
    assert(tokens.contains("hous"))
    assert(!tokens.exists(_.length == 1))
  }

  test("F10: literal-space split keeps empty tokens (quirk Q6)") {
    val words = essays.filter(col("age") === 24) // all-empty essays
      .select(TextFunctions.splitWords(col("essays")))
      .head().getSeq[String](0)
    assert(words.length == 10) // 10 empty fields joined by 9 spaces
    assert(words.forall(_ == ""))
  }

  test("F1: multiline quoted essay survives ingestion") {
    val txt = essays.filter(col("age") === 33)
      .select(col("essays")).head().getString(0)
    assert(txt.contains("second \"quoted\" line"))
    assert(txt.contains("\n"))
  }
}
