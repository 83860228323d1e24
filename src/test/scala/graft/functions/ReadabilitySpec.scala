package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-checked Flesch-Kincaid components and grade. */
class ReadabilitySpec extends SparkSuite {
  import spark.implicits._

  private def row(text: String) =
    Seq(text).toDF("t")
      .select(
        TextAnalysis.whitespaceTokenCount(col("t")).as("w"),
        TextAnalysis.sentenceCount(col("t")).as("s"),
        TextAnalysis.syllableEstimate(col("t")).as("sy"))
      .select(col("w"), col("s"), col("sy"),
        round(TextAnalysis.fleschKincaidGrade(
          col("w"), col("s"), col("sy")), 6).as("g"))
      .collect().head

  test("counts and grade on a two-sentence text") {
    val r = row("The cat sat. It ran!")
    // words 5, sentences 2 (".", "!"), syllables 5 (e,a,a,I,a)
    assert(r.getInt(0) === 5 && r.getInt(1) === 2 && r.getInt(2) === 5)
    // 0.39·(5/2) + 11.8·(5/5) − 15.59 = −2.815
    assert(r.getDouble(3) === -2.815)
  }

  test("sentence and syllable floors: no terminal punct, no vowels") {
    val r = row("hmm grr pfft")
    assert(r.getInt(1) === 1 && r.getInt(2) === 1)
  }

  test("consecutive terminators count as one sentence break") {
    val r = row("Wait... what?! ok")
    // "..." then "?!" → 2 sentence runs
    assert(r.getInt(1) === 2)
  }
}
