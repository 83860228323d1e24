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

  test("hand-computed fractions — top_bigram_frac is the fraction " +
      "of bigram POSITIONS, always in [0, 1]") {
    // 4 tokens, 2 types → dup 0.5; 3 bigram positions: "a a"×2,
    // "a b" → top 2/3. (The earlier tokens-covered numerator scored
    // overlapping occurrences 2·2/4 and could exceed 1 — "x x x"
    // gave 4/3.)
    assert(stats("a a a b") == ((4L, 0.5, 2.0 / 3)))
    // all distinct → dup 0; every bigram unique → 1/4
    assert(stats("v w x y z") == ((5L, 0.0, 0.25)))
    // degenerate repetition maxes both signals — and top is exactly
    // 1.0, never above
    val (n, dup, top) = stats("spam spam spam spam spam spam")
    assert(n == 6L && dup == 1.0 - 1.0 / 6.0 && top == 1.0)
    assert(stats("x x x") == ((3L, 1.0 - 1.0 / 3.0, 1.0)))
  }

  test("single-token doc: no bigrams, fraction 0") {
    assert(stats("alone") == ((1L, 0.0, 0.0)))
  }
}
