package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a tokenized corpus — the lexical
  * complement to the embedding ANN surface (`Similarity`): score =
  * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with the
  * Lucene-style smoothed idf = log10(1 + (N−df+0.5)/(df+0.5)), which
  * is strictly positive so stopword-frequency terms dampen rather
  * than flip rankings. Base 10 rather than the textbook ln: a log
  * base change is a constant positive scaling of every score, so
  * rankings are untouched — and log10 is this engine's proven
  * bit-replayable cross-engine log primitive ([[Log10IDF]],
  * [[UnigramLM]] are both driver-green on it), where raw `ln` has no
  * such precedent (see the q_retrieval_metrics libm-ulp note).
  *
  * Scale shape (the inverted index, relationally):
  *  - [[postings]] is the index build — one `(term, doc_id)` shuffle
  *    producing per-posting tf and per-term df. At corpus scale this
  *    is THE canonical inverted-index job; everything downstream
  *    joins it by term.
  *  - [[scoreTopK]] broadcasts the (small) query-term set, so the
  *    posting list is filtered map-side to the matched terms only —
  *    the corpus is never reshuffled for a query batch. The per-query
  *    candidate aggregation shuffles only matched postings, and the
  *    final top-k uses the bounded `top_k_by` aggregate (map-side
  *    partial heaps), never a global rank window.
  *
  * Determinism: two-stage integer lattice. Of the whole scoring
  * chain, `log10` is the ONLY operation IEEE-754 does not require to
  * be correctly rounded — every other step (+, ·, /) is exact-rounded
  * and therefore bit-identical in any compliant engine. So the idf is
  * snapped ALONE to a coarse micro lattice (`round(idf·1e6)`, ~9
  * orders of margin over a 1-ulp libm wobble), and the per-term
  * contribution `round(idf_micro·tfNorm·1e3)` then rounds a
  * bit-identical double — deterministic across engines by
  * construction, not by luck. Contributions sum as longs
  * (order-independent, the `UnigramLM` policy); with contributions
  * ≤ ~2e10 nano and ≤ thousands of query terms the sum stays below
  * 2^53, so the double handed to `top_k_by` is exact.
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Inverted-index statistics: one row per posting
    * `(term, doc_id, tf, dl, df)` — tf = term count in doc, dl = doc
    * token length, df = number of docs containing term. Two
    * aggregations: (doc,term)→tf (the exploded shuffle) then term→df
    * re-joined onto the postings (a self-shuffle on term, the join
    * key every consumer uses anyway).
    */
  def postings(docs: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    Reserved.check("postings" -> docs)
    val tf = docs
      .select(col(idCol).as("doc_id"),
        size(col(tokensCol)).as("dl"),
        explode(col(tokensCol)).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
  }

  /** Corpus totals as a 1-row frame `(n_docs, avgdl)` for broadcast
    * into the scoring join (no driver-side action; the
    * q_token_budget broadcast-total pattern). avgdl is
    * Σdl/N computed in double — both engines evaluate the same
    * division on the same integers.
    */
  def totals(docs: DataFrame, idCol: String, tokensCol: String): DataFrame =
    docs.agg(
      count(col(idCol)).as("n_docs"),
      (sum(size(col(tokensCol))).cast("double") /
        count(col(idCol)).cast("double")).as("avgdl"))

  /** Top-k BM25 retrieval. `queryTerms` is `(query_id, term)` —
    * DISTINCT per query (duplicate query terms would double-count).
    * Docs equal to their own query id are excluded (the retrieval
    * convention the ANN queries use). Output: (query_id, doc_id,
    * score_nano, rank) with rank ≤ k in (score desc, doc_id asc)
    * order.
    */
  def scoreTopK(
      index: DataFrame, corpusTotals: DataFrame, queryTerms: DataFrame,
      k: Int, k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    Reserved.check("queryTerms" -> queryTerms)
    val idfMicro = round(log10(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))) * lit(1e6)).cast("long")
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") / col("avgdl")))
    val contrib = index
      .join(broadcast(queryTerms.select(col("query_id"), col("term"))), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(corpusTotals))
      .select(col("query_id"), col("doc_id"),
        round(idfMicro.cast("double") * tfNorm * lit(1e3)).cast("long")
          .as("c_nano"))
    val scored = contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c_nano")).as("score_nano"))
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.top_k_by(
        col("score_nano").cast("double"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        col("col.score").cast("long").as("score_nano"),
        (col("pos") + 1).as("rank"))
  }

  /** Rocchio-style pseudo-relevance-feedback expansion: run the
    * query batch once, take each query's top-`m` documents as
    * pseudo-relevant, and add the `e` terms with the highest summed
    * tf across them (excluding the query's own terms; ties tf-sum
    * desc, term asc). Returns the EXPANDED `(query_id, term)` batch —
    * feed it back through [[scoreTopK]] for the second pass. One
    * round of the classical PRF loop, fully deterministic.
    *
    * Scale shape: the feedback set is queries×m rows (broadcast into
    * the posting-list join, so the index filters map-side exactly
    * like query scoring); candidate terms group on (query, term) —
    * bounded by the feedback docs' vocabularies, never the corpus —
    * and the top-e window runs per query over that bounded frame.
    */
  def prfExpandTerms(
      index: DataFrame, corpusTotals: DataFrame, queryTerms: DataFrame,
      m: Int = 5, e: Int = 3,
      k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(m > 0, s"m: $m")
    require(e > 0, s"e: $e")
    val feedback = scoreTopK(index, corpusTotals, queryTerms, m, k1, b)
      .select(col("query_id"), col("doc_id"))
    val cand = index
      .join(broadcast(feedback), "doc_id")
      .groupBy(col("query_id"), col("term"))
      .agg(sum(col("tf")).as("__tfsum"))
      .join(queryTerms.select(col("query_id"), col("term")),
        Seq("query_id", "term"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__tfsum").desc, col("term"))
    val expansion = cand
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= e)
      .select(col("query_id"), col("term"))
    queryTerms.select(col("query_id"), col("term"))
      .union(expansion).distinct()
  }
}
