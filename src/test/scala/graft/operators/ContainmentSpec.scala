package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSuite {
  import spark.implicits._

  // doc 2 is doc 1 quoted whole inside a much larger page: the
  // boilerplate-wrapper case. Containment(1,2) = 1.0 while Jaccard
  // is low — exactly the pair a Jaccard-threshold dedup keeps.
  private val inner = "alpha beta gamma delta epsilon zeta"
  private val wrapper = ("header menu nav " * 5) + inner +
    (" footer contact terms privacy copyright" * 5)
  private val docs = Seq(
    (1L, inner),
    (2L, wrapper),
    (3L, "completely different words about other topics entirely here")
  ).toDF("doc_id", "text")
    .select(col("doc_id"), split(col("text"), " ", -1).as("tokens"))

  private def shingles = Dedup.shingleSets(docs, "doc_id", "tokens", 3)

  test("subset pair has containment 1.0 but low jaccard") {
    val out = Dedup.containmentPairs(shingles, 0.9).collect()
    val p = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p.isDefined, "wrapper pair must surface")
    assert(p.get.getAs[Double]("containment") === 1.0)
    assert(p.get.getAs[Double]("jaccard") < 0.5,
      "jaccard must be low for the wrapper pair — that's the point")
    // ...and a jaccard-threshold pass at the same bar would miss it
    assert(Dedup.jaccardPairs(shingles, 0.9).count() === 0L)
  }

  test("unrelated docs never pair") {
    val out = Dedup.containmentPairs(shingles, 0.5).collect()
    assert(!out.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("hot-shingle cap drops stop-phrase candidates") {
    // shared hot shingle across all docs; cap at docfreq 2 removes it
    val hotDocs = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "the quick brown cat sleeps well"),
      (3L, "the quick brown dog barks loud"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ", -1).as("tokens"))
    val sh = Dedup.shingleSets(hotDocs, "doc_id", "tokens", 3)
    val uncapped = Dedup.containmentPairs(sh, 0.1).count()
    val capped = Dedup.containmentPairs(sh, 0.1, Some(2)).count()
    assert(uncapped > 0L && capped === 0L)
  }
}
