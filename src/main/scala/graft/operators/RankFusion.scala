package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
  * the standard way to combine heterogeneous rankers (lexical BM25,
  * query-likelihood, embedding ANN) without score calibration:
  *
  *   rrf(d) = Σ_lists 1 / (k + rank_list(d)),   k = 60 by default.
  *
  * Only ranks cross the fusion boundary, so incommensurable scores
  * (BM25 nanounits vs log-probability microunits vs cosine) fuse
  * soundly — which is exactly why hybrid retrieval stacks use it.
  *
  * Scale shape: each input list is already top-k-per-query (bounded:
  * queries × k rows), so the fusion is a union of small frames, one
  * aggregation keyed by (query, doc), and a bounded `top_k_by` —
  * no corpus-sized data ever reaches this operator.
  *
  * Determinism: 1/(k+rank) is one correctly-rounded IEEE division of
  * exact integers — bit-identical in any engine — and is snapped to a
  * nano lattice per contribution BEFORE summing, so the fused score
  * is an order-independent long sum regardless of how many lists
  * participate (a raw double Σ over 3+ lists would be
  * addition-order-sensitive).
  */
object RankFusion {

  val DefaultK = 60

  /** Fuse ranked lists, each `(query_id, doc_id, rank)` with rank ≥ 1.
    * A document absent from a list simply contributes nothing for it
    * (the standard convention). Output: (query_id, doc_id, rrf_nano,
    * rank) with rank ≤ topK in (rrf desc, doc_id asc) order.
    */
  def reciprocalRankFusion(
      lists: Seq[DataFrame], topK: Int, k: Int = DefaultK): DataFrame = {
    require(lists.nonEmpty, "reciprocalRankFusion needs at least one list")
    val contribs = lists.map(
      _.select(col("query_id"), col("doc_id"),
        round(lit(1e9) / (lit(k).cast("double") +
          col("rank").cast("double"))).cast("long").as("c_nano")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c_nano")).as("rrf_nano"))
    fused
      .groupBy(col("query_id"))
      .agg(graft.functions.top_k_by(
        col("rrf_nano").cast("double"), col("doc_id"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        col("col.score").cast("long").as("rrf_nano"),
        (col("pos") + 1).as("rank"))
  }
}
