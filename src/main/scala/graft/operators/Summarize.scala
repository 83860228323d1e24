package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-centroid extractive summarization: per document, the
  * top-k sentences by coverage of the document's own most frequent
  * terms — the classical Luhn/centroid heuristic, fully
  * deterministic (no model, no float), as the doc-condensation stage
  * of a curation pipeline (what goes in a preview/index entry).
  *
  * Chain: sentence split on terminal-punctuation runs → per-sentence
  * whitespace tokens → doc term counts FROM those sentence tokens
  * (one tokenization feeds both sides, so "sat." vs "sat" can never
  * disagree) → top-`topTerms` terms per doc (count desc, term asc —
  * quirk-Q6 tie order) → sentence score = occurrences of top terms
  * in the sentence → top-`k` sentences (score desc, position asc).
  * Sentences containing no top term are not candidates (a doc with
  * fewer than k scoring sentences returns fewer rows).
  *
  * Scale shape: every exchange is keyed by doc — explodes, counts,
  * and both row_number windows partition on doc_id; nothing global,
  * no all-pairs. The per-doc state any task holds is one document's
  * sentence/term set.
  */
object Summarize {

  /** (doc_id, rank, pos, sentence, score) with rank ≤ k per doc;
    * pos is the 1-based sentence position in the original text.
    */
  def centroidSummary(
      docs: DataFrame, idCol: String, textCol: String,
      topTerms: Int = 10, k: Int = 3): DataFrame = {
    require(topTerms > 0, s"topTerms: $topTerms")
    require(k > 0, s"k: $k")
    val sent = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "[.!?]+")).as(Seq("pos0", "raw")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        trim(col("raw")).as("sentence"))
      .filter(length(col("sentence")) > 0)
    val sentTokens = sent
      .select(col("doc_id"), col("pos"),
        explode(split(col("sentence"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
    val wTop = Window.partitionBy(col("doc_id"))
      .orderBy(col("cnt").desc, col("w"))
    val top = sentTokens.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= topTerms)
      .select(col("doc_id"), col("w"))
    val score = sentTokens.join(top, Seq("doc_id", "w"))
      .groupBy(col("doc_id"), col("pos"))
      .agg(count(lit(1)).as("score"))
    val wSent = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("pos"))
    score.join(sent, Seq("doc_id", "pos"))
      .withColumn("rank", row_number().over(wSent))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("pos"),
        col("sentence"), col("score"))
  }
}
