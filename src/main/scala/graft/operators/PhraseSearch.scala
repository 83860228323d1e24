package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over a POSITIONAL inverted index — the IR
  * operator [[Bm25]]'s bag-of-words index cannot express: "these k
  * tokens, consecutively, in order". The index adds one column (pos)
  * to the BM25 postings; phrase matching is then pure relational
  * algebra — no per-document string scan, no regex over text.
  *
  * Matching (the classic positional-intersection join, relationally):
  * a phrase row (query_id, off, term) asserts `term` at offset `off`;
  * joining it to postings on term yields candidate anchors
  * `start = pos − off`, and an anchor where ALL `len` offsets landed
  * (`count = len` per (query, doc, start)) is a full occurrence.
  * Duplicate terms inside a phrase are safe: (doc, start, off)
  * determines pos, so each offset contributes at most one row.
  *
  * Scale shape: the phrase set is query-batch-sized and BROADCAST, so
  * the posting list is filtered map-side to the phrase terms before
  * anything shuffles — the corpus-sized index is never reshuffled for
  * a query batch, and the only aggregation runs on matched candidates
  * (bounded by the rarest phrase term's posting list, the reason
  * search engines intersect rarest-first).
  */
object PhraseSearch {

  /** Positional postings `(term, doc_id, pos)`, pos 1-based — the
    * [[Bm25.postings]] index plus in-document position.
    */
  def positionalPostings(
      docs: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    Reserved.check("positionalPostings" -> docs)
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(col(tokensCol)).as(Seq("pos0", "term")))
      .select(col("term"), col("doc_id"), (col("pos0") + 1).as("pos"))
  }

  /** Extract one query phrase per doc: the `len` tokens starting at
    * 1-based `startPos`. Docs too short to supply the full phrase are
    * dropped (a shorter phrase would silently change semantics).
    * Returns `(query_id, off, term)` with off in [0, len).
    */
  def phrasesFromTokens(
      docs: DataFrame, idCol: String, tokensCol: String,
      startPos: Int, len: Int): DataFrame = {
    require(startPos >= 1 && len >= 1, s"bad phrase window: $startPos/$len")
    docs
      .filter(size(col(tokensCol)) >= startPos + len - 1)
      .select(col(idCol).as("query_id"),
        posexplode(slice(col(tokensCol), startPos, len))
          .as(Seq("off", "term")))
  }

  /** All documents containing each phrase at least once, with the
    * occurrence count: `(query_id, doc_id, n_matches)`. The query's
    * own document is excluded (the engine's retrieval convention).
    */
  def phraseMatches(
      index: DataFrame, phrases: DataFrame, len: Int): DataFrame = {
    require(len >= 1, s"len must be >= 1: $len")
    index
      .join(broadcast(phrases.select(col("query_id"), col("off"), col("term"))),
        "term")
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("off")).as("start"))
      .groupBy(col("query_id"), col("doc_id"), col("start"))
      .agg(count(lit(1)).as("k"))
      .filter(col("k") === len)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }
}
