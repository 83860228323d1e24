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

  /** Per-depth weights for truncated [[rankBiasedOverlap]] at
    * p = 1/2: W(m) = Σ_{d=m..k} 1/(d·2^d), the total contribution of
    * a document whose worse rank is m, precomputed as EXACT
    * BigDecimal sums snapped once to the 9-dp lattice — the shared-
    * constant trick `Similarity.retrievalMetrics` uses for NDCG
    * discounts, so neither engine evaluates a power or a division at
    * query time.
    */
  def rboWeights(k: Int): Seq[(Int, java.math.BigDecimal)] = {
    require(k >= 1 && k <= 62, s"k: $k")
    (1 to k).map { m =>
      val w = (m to k).map { d =>
        BigDecimal(1) / (BigDecimal(d) * BigDecimal(2).pow(d))
      }.sum.setScale(9, BigDecimal.RoundingMode.HALF_UP)
      m -> w.bigDecimal
    }
  }

  /** Truncated rank-biased overlap (Webber, Moffat & Zobel 2010)
    * between two top-k rankings at persistence p = 1/2: how much do
    * two rankers agree, weighted toward the top —
    *
    *   RBO@k = Σ_{d=1..k} (1−p)·p^{d−1} · |A:d ∩ B:d| / d
    *
    * re-grouped per MATCHED document (a doc whose worse rank is m
    * appears in every depth-d intersection for d ≥ m) so the score
    * is a sum of per-match constants W(m) — exact DECIMAL adds, no
    * order sensitivity, no powers at query time ([[rboWeights]]).
    * p = 1/2 weights agreement on rank 1 at 50% of the total mass —
    * the top-heavy regime a curation pipeline wants when comparing
    * rankers ("do they retrieve the same head?"); the truncated
    * (non-extrapolated) form is the deterministic lower bound
    * RBO_min of the paper.
    *
    * Inputs: two `(query_id, doc_id, rank)` lists with rank ≥ 1
    * (rows beyond `k` are ignored). Output: (query_id, n_overlap,
    * rbo) for every query in EITHER list — disjoint rankings score
    * 0, not absent. Everything is bounded: queries × k rows in, one
    * (query, doc) equi-join, one group-sized aggregation.
    */
  def rankBiasedOverlap(
      a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val spark = a.sparkSession
    import org.apache.spark.sql.types.DecimalType
    val weights = rboWeights(k)
    val wDf = broadcast(spark.createDataFrame(
      weights.map { case (m, w) => (m, new java.math.BigDecimal(w.toString)) }
    ).toDF("__m", "__w")
      .select(col("__m"), col("__w").cast(DecimalType(18, 9)).as("__w")))
    def side(df: DataFrame, rc: String) = df
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank").as(rc))
    val matched = side(a, "__ra").join(side(b, "__rb"),
        Seq("query_id", "doc_id"))
      .withColumn("__m", greatest(col("__ra"), col("__rb")).cast("int"))
      .join(wDf, "__m")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("__w").cast(DecimalType(38, 12))).as("__s"))
    val queries = a.select(col("query_id"))
      .union(b.select(col("query_id"))).distinct()
    queries.join(matched, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("__s").cast("double"), lit(0.0)), 6).as("rbo"))
  }
}
