package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-modal pair alignment: keep (left, right) pairs that are each
  * other's nearest neighbor — the LAION-style mutual-best filter a
  * multimodal corpus runs to keep only image/caption pairs whose
  * embeddings actually agree, dropping mismatched scrapes.
  *
  * Mutual top-1 is deliberately stricter than a one-directional
  * cosine threshold: a caption generically close to MANY images (alt
  * text boilerplate) wins none of its candidates' reverse matches and
  * is dropped, which a threshold filter cannot do.
  *
  * Scale design: both directions ride [[Similarity.bruteForceTopK]]'s
  * bounded map-side top-k (exchange ≤ queries×1 rows), so the mutual
  * join is between two |left|- and |right|-sized frames, never the
  * pairwise score matrix. The brute inner product broadcasts the
  * query side — right-sized for the "queries ≪ corpus" shape; at
  * corpus×corpus scale swap each direction for the IVF-blocked search
  * ([[Similarity.ivfTopKSampledCodebook]]) and keep the same mutual
  * join — the filter's semantics don't change with the search path.
  */
object ModalAlign {

  /** (left_id, right_id, cosine): pairs where `right` is `left`'s
    * top-1 neighbor AND `left` is `right`'s top-1, cosine on the
    * engine's 6-dp lattice, ties broken by neighbor id asc (the
    * [[Similarity]] convention, so "top-1" is deterministic).
    */
  def mutualTop1(
      left: DataFrame, right: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val l2r = Similarity.bruteForceTopK(left, right, idCol, vecCol, k = 1)
      .select(col("query_id").as("left_id"),
        col("neighbor_id").as("right_id"), col("cosine"))
    val r2l = Similarity.bruteForceTopK(right, left, idCol, vecCol, k = 1)
      .select(col("query_id").as("right_id"),
        col("neighbor_id").as("left_id"))
    l2r.join(r2l, Seq("left_id", "right_id"))
  }
}
