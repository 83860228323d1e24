package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reverse search — match INCOMING documents against STORED queries
  * (the Elasticsearch "percolator" / alerting primitive): a saved
  * query is a conjunctive term set, and every new document must be
  * routed to the alerts whose terms it fully contains. Running each
  * stored query as a forward search is queries × corpus work per
  * ingest; percolation inverts it — index the BATCH, stream the
  * (small, stored) query terms through it:
  *
  *  1. distinct (doc, term) postings over the incoming batch only —
  *     one row-local explode + map-side-combined distinct;
  *  2. join stored query terms on term (shuffle key = term; the
  *     batch, not the corpus, bounds the index);
  *  3. a (query, doc) count equal to the query's term count means
  *     every conjunct matched — exact, no verify pass needed because
  *     term-set containment IS the query semantics (contrast
  *     [[TrigramSearch]], where trigram containment merely
  *     approximates substring containment).
  *
  * Queries with zero terms match nothing (vacuous-truth conjunctions
  * are refused rather than matching every document).
  */
object Percolator {

  /** (query_id, doc_id) for every incoming doc containing ALL of the
    * query's terms. `queries` carries (query id, term) rows —
    * duplicates are collapsed.
    */
  def percolate(
      batch: DataFrame, idCol: String, tokensCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String): DataFrame = {
    Reserved.check("batch" -> batch, "queries" -> queries)
    val postings = batch
      .select(col(idCol).as("__d"),
        explode(col(tokensCol)).as("__t"))
      .distinct()
    val qt = queries
      .select(col(queryIdCol).as("__q"), col(termCol).as("__t"))
      .where(col("__t").isNotNull)
      .distinct()
    val need = qt.groupBy(col("__q")).agg(count(lit(1)).as("__need"))
    qt.join(postings, Seq("__t"))
      .groupBy(col("__q"), col("__d"))
      .agg(count(lit(1)).as("__got"))
      .join(need, Seq("__q"))
      .filter(col("__got") === col("__need"))
      .select(col("__q").as("query_id"), col("__d").as("doc_id"))
  }
}
