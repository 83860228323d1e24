package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty,
  * SIGIR 2001) — the language-modeling counterpart to [[Bm25]] on the
  * SAME inverted index:
  *
  *   score(q,d) = Σ_{t∈q} log p(t|d),
  *   p(t|d) = (tf_{t,d} + µ·p(t|C)) / (dl_d + µ)
  *
  * where p(t|C) = cf_t / C is the collection unigram model. Scored in
  * log10 (a positive constant rescale of the natural-log textbook
  * form — rank-preserving, and log10 is the engine's bit-replayable
  * log primitive; see the [[Bm25]] base-choice note).
  *
  * Candidate generation: the full sum over EVERY query term would
  * score every document (tf = 0 terms still contribute µp/(dl+µ)), so
  * it is decomposed into matched and unmatched parts:
  *
  *   score = Σ_{t∈q} log(µ·p_t)                  (query-only constant)
  *         + Σ_{t∈q,tf>0} [log(tf+µ·p_t) − log(µ·p_t)]   (matched Δ)
  *         − |q| · log(dl + µ)                   (doc-length part)
  *
  * and only documents matching ≥ 1 query term are candidates — the
  * standard retrieval restriction (a zero-match document ranks below
  * every candidate for any µ, so top-k over candidates is exact as
  * long as k ≤ candidate count, which holds for real query batches).
  *
  * Scale shape: identical to [[Bm25.scoreTopK]] — the query-term set
  * broadcasts, the posting list is filtered map-side, the per-query
  * candidate aggregation shuffles only matched postings, and top-k is
  * the bounded `top_k_by` aggregate. The term model (cf_t) is one
  * extra aggregate over the postings relation it already shuffles.
  *
  * Determinism (the [[Bm25]] two-stage-lattice policy): every log10 —
  * the one not-correctly-rounded IEEE op — is snapped ALONE to a
  * micro lattice (`round(log10(·)·1e6)` as long); everything reaching
  * a log's argument is exact-rounded arithmetic on exact integers
  * (cf/C division, µ·p product, tf+µp addition — bit-identical in any
  * compliant engine), and the score is then a pure long combination
  * Σl1 + ΣΔ − |q|·ldl. Magnitudes: |score_micro| ≤ |q|·~10·1e6 — for
  * thousand-term queries still < 2^53 as a double for `top_k_by`.
  */
object QueryLikelihood {

  val DefaultMu = 2000.0

  /** Per-term collection statistics from a [[Bm25.postings]] frame:
    * `(term, l1_micro)` where l1_micro = round(log10(µ·cf_t/C)·1e6)
    * and C = Σ tf over all postings (the collection token count).
    * The 1-row total broadcasts (the q_token_budget pattern).
    */
  def termModel(postings: DataFrame, mu: Double = DefaultMu): DataFrame = {
    val cf = postings.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val total = cf.agg(sum(col("cf")).as("__c"))
    cf.crossJoin(broadcast(total))
      .select(col("term"), col("cf"),
        round(log10(lit(mu) * (col("cf").cast("double") /
          col("__c").cast("double"))) * lit(1e6)).cast("long")
          .as("l1_micro"))
  }

  /** Top-k Dirichlet query-likelihood retrieval. `queryTerms` is
    * `(query_id, term)`, DISTINCT per query; the query doc itself is
    * excluded (the [[Bm25.scoreTopK]] convention). Output:
    * (query_id, doc_id, score_micro, rank), rank ≤ k in
    * (score desc, doc_id asc) order. score_micro < 0 always (log of
    * probabilities); larger = more likely.
    */
  def scoreTopK(
      index: DataFrame, queryTerms: DataFrame,
      k: Int, mu: Double = DefaultMu): DataFrame = {
    Reserved.check("queryTerms" -> queryTerms)
    val model = termModel(index, mu)
    val total = model.agg(sum(col("cf")).as("__c"))
    val qt = queryTerms.select(col("query_id"), col("term"))
      .join(model, "term")
    // per-query constant: Σ log(µ·p_t) and the term count |q|
    val qconst = qt.groupBy(col("query_id"))
      .agg(sum(col("l1_micro")).as("qconst_micro"),
        count(lit(1)).as("qlen"))
    // matched Δ per (query, doc): log(tf+µp) − log(µp), plus the doc
    // length each posting already carries. µ·p is recomputed from the
    // exact integers (cf, C) — NOT reconstituted from l1_micro via
    // pow(10,·), which is a second not-correctly-rounded libm op and
    // would put cross-engine wobble back inside the log argument.
    val muP = lit(mu) *
      (col("cf").cast("double") / col("__c").cast("double"))
    val matched = index
      .join(broadcast(qt), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(total))
      .select(col("query_id"), col("doc_id"), col("dl"),
        (round(log10(col("tf").cast("double") + muP) * lit(1e6))
          .cast("long") - col("l1_micro")).as("delta_micro"))
    val perDoc = matched
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("delta_micro")).as("md_micro"), max(col("dl")).as("dl"))
    val scored = perDoc.join(broadcast(qconst), "query_id")
      .select(col("query_id"), col("doc_id"),
        (col("qconst_micro") + col("md_micro") -
          col("qlen") * round(log10(col("dl").cast("double") + lit(mu))
            * lit(1e6)).cast("long")).as("score_micro"))
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.top_k_by(
        col("score_micro").cast("double"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        col("col.score").cast("long").as("score_micro"),
        (col("pos") + 1).as("rank"))
  }
}
