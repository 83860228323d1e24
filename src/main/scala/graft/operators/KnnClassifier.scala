package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbor label propagation over the embedding space —
  * the curation move that turns a small set of human-labeled
  * (quality/domain/topic) examples into labels for the whole corpus:
  * each unlabeled row takes the majority label of its k nearest
  * labeled neighbors by cosine.
  *
  * Scale shape: the LABELED set is the broadcast side (it is the
  * small, human-annotated one; the unlabeled corpus can be 100 TB),
  * so scoring is map-side over a single unlabeled scan — the reverse
  * orientation of [[Similarity.bruteForceTopK]], which broadcasts
  * queries. The per-row top-k uses the bounded `top_k_by` aggregate
  * (map-side partial heaps, exchange ≤ rows×k), and the vote groups
  * rows×k — never corpus-sized. If the labeled set outgrows a
  * broadcast, swap candidate generation for the IVF/LSH paths in
  * [[Similarity]]; the vote is unchanged.
  *
  * Determinism: neighbors rank on the 6-dp-rounded cosine with
  * neighbor-id tie-break (the ANN convention); the vote breaks count
  * ties on the smallest label. Both orders are total, so the result
  * replays exactly in any engine.
  */
object KnnClassifier {

  /** Predict a label for every row of `unlabeled` from the majority
    * vote of its `k` nearest rows of `labeled` (cosine on `vecCol`).
    * Output: (query_id, label, votes, best_rank) — best_rank is the
    * best (smallest) neighbor rank among the winning label's voters,
    * a confidence hint the caller can threshold on.
    */
  def classify(
      unlabeled: DataFrame, labeled: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    Reserved.check("unlabeled" -> unlabeled, "labeled" -> labeled)
    // the scoring side is the big one — right-size a narrow scan so
    // the broadcast-cross cosine pass parallelizes (guide §2.5)
    val q = Par.widen(unlabeled)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = labeled.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"))
    val scored = q.crossJoin(broadcast(c))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.cosine(col("__qv"), col("__cv")), 6)
          .as("cosine"))
    val neighbors = Similarity.topKPerQuery(scored, k)
    val voted = neighbors
      .join(broadcast(labeled.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("label"))), "neighbor_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    voted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Label-noise detection (confident-learning style, deterministic):
    * re-predict every LABELED row's label from its k nearest OTHER
    * labeled rows (leave-one-out — [[classify]] already excludes
    * self-matches) and surface the disagreements. On a curation
    * pipeline this is the label-QA pass before the labels train a
    * quality filter: a row whose neighborhood votes against its
    * recorded label is either mislabeled or sits on a genuine class
    * boundary, and `votes`/`best_rank` say which.
    *
    * Output: (vec_id, recorded, predicted, votes, best_rank), only
    * rows where predicted ≠ recorded. Same scale shape as
    * [[classify]] — the labeled set is the broadcast side twice
    * (scoring and vote join); candidate generation swaps to the
    * [[Similarity]] ANN paths when the labeled set outgrows a
    * broadcast.
    */
  def labelNoise(
      labeled: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame =
    classify(labeled, labeled, idCol, vecCol, labelCol, k)
      .join(broadcast(labeled.select(col(idCol).as("query_id"),
        col(labelCol).as("recorded"))), "query_id")
      .filter(col("label") =!= col("recorded"))
      .select(col("query_id").as("vec_id"), col("recorded"),
        col("label").as("predicted"), col("votes"), col("best_rank"))
}
