package graft.functions

import graft.SparkSuite

class RepetitionStatsSpec extends SparkSuite {
  import spark.implicits._

  private def stats(text: String): (Long, Double, Double) = {
    val r = TextAnalysis.repetitionStats(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    (r.getLong(1), r.getDouble(2), r.getDouble(3))
  }

  test("hand-computed fractions") {
    // 4 tokens, 2 types → dup 0.5; bigrams: "a a"×2, "a b" → top 2·2/4
    assert(stats("a a a b") == ((4L, 0.5, 1.0)))
    // all distinct → dup 0; every bigram unique → 2/5
    assert(stats("v w x y z") == ((5L, 0.0, 0.4)))
    // degenerate repetition maxes both signals
    val (n, dup, top) = stats("spam spam spam spam spam spam")
    assert(n == 6L && dup == 1.0 - 1.0 / 6.0 && top == 2.0 * 5 / 6)
  }

  test("single-token doc: no bigrams, fraction 0") {
    assert(stats("alone") == ((1L, 0.0, 0.0)))
  }
}
