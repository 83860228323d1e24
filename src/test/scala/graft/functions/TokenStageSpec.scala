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
}
