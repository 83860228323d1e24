package graft.operators

import graft.SparkSuite

/** Integer-lattice MRR/NDCG: hand-computed small cases — perfect,
  * partial, and empty retrieval.
  */
class RetrievalMetricsSpec extends SparkSuite {
  import spark.implicits._

  private val d = Similarity.ndcgDiscountsNano(3)
  private val idcg = d.sum

  test("perfect, partial and empty retrieval") {
    // query 10: approx == exact (perfect)
    // query 20: hits at approx ranks 1 and 3, first hit rank 1
    // query 30: no hits
    val exact = Seq(
      (10L, 1L, 1L), (10L, 2L, 2L), (10L, 3L, 3L),
      (20L, 1L, 1L), (20L, 2L, 2L), (20L, 3L, 3L),
      (30L, 1L, 1L), (30L, 2L, 2L), (30L, 3L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val approx = Seq(
      (10L, 1L, 1L), (10L, 2L, 2L), (10L, 3L, 3L),
      (20L, 2L, 1L), (20L, 9L, 2L), (20L, 1L, 3L),
      (30L, 7L, 1L), (30L, 8L, 2L), (30L, 9L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.retrievalMetrics(exact, approx, 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ndcg20 = (d(0) + d(2)) * 1000000000L / idcg
    assert(got == Seq(
      (10L, 3L, 1000000L, 1000000000L),
      (20L, 2L, 1000000L, ndcg20),
      (30L, 0L, 0L, 0L)))
  }

  test("first hit below rank 1 gives floor(1e6/rank)") {
    val exact = Seq((1L, 5L, 1L)).toDF("query_id", "neighbor_id", "rank")
    val approx = Seq((1L, 4L, 1L), (1L, 6L, 2L), (1L, 5L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.retrievalMetrics(exact, approx, 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._3 == 333333L) // 1000000 div 3
    assert(got._4 == d(2) * 1000000000L / idcg)
  }
}
