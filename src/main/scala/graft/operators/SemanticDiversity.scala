package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group semantic diversity: the AVERAGE PAIRWISE COSINE of a
  * group's embeddings, computed WITHOUT the pairwise join. For unit
  * vectors u_i, Σ_{i≠j} cos(u_i,u_j) = ‖Σu‖² − n, so
  *
  *   avg_cos = (‖Σ_i u_i‖² − n) / (n·(n−1))
  *
  * — one aggregation over the corpus instead of n² cosine pairs. High
  * avg_cos = a redundant, self-similar source (dedup candidate);
  * low = diverse. This is the corpus-curation "source redundancy"
  * signal at scan cost; the naive formulation is the textbook
  * 100-TB-scale killer (n² at n = millions per source).
  *
  * Determinism: unit vectors are snapped to an integer MICRO lattice
  * (round(u_d·1e6)) before any aggregation, so the per-dimension sums
  * S_d are exact integers (order-free) and ‖Σu‖² = Σ_d S_d² is exact
  * integer arithmetic — DECIMAL(38,0) here (the product stays ≪ 38
  * digits: S_d ≤ n·1e6, so Σ_d S_d² ≤ dims·n²·1e12 — fits to
  * n ≈ 10⁹ rows per group at dims = 64), HUGEINT in the DuckDB
  * replay. Only the final three-term formula runs in double, on
  * identical inputs in both engines. The micro (not nano) lattice
  * keeps the norm's float ulps ~10⁻¹⁰ away from any rounding
  * boundary — the snap itself cannot flip cross-engine.
  */
object SemanticDiversity {

  private val dec38 = DecimalType(38, 0)

  /** `(groupCol, n, avg_cos_ppm)` for groups with ≥ 2 rows;
    * zero-norm vectors are dropped (no unit direction). avg_cos_ppm =
    * round(avg_cos·1e6) — the diversity score on an integer edge.
    */
  def averagePairwiseCosine(
      df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    Reserved.check("averagePairwiseCosine" -> df)
    val x = col("__x").cast("double")
    val norms = df
      .select(col(groupCol), col(vecCol).as("__v"))
      .withColumn("__nrm",
        sqrt(aggregate(col("__v"), lit(0.0d), (a, e) =>
          a + e.cast("double") * e.cast("double"))))
      .filter(col("__nrm") > 0)
    val counts = norms.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val ssq = norms
      .select(col(groupCol), col("__nrm"),
        posexplode(col("__v")).as(Seq("__d", "__x")))
      .select(col(groupCol), col("__d"),
        round(x / col("__nrm") * lit(1e6)).cast("long").as("__un"))
      .groupBy(col(groupCol), col("__d"))
      .agg(sum(col("__un").cast(dec38)).as("__s"))
      .groupBy(col(groupCol))
      .agg(sum(col("__s") * col("__s")).cast("double").as("__ssq"))
    ssq
      .join(counts, Seq(groupCol))
      .filter(col("n") >= 2)
      .select(col(groupCol), col("n"),
        {
          val nD = col("n").cast("double")
          round((col("__ssq") / lit(1e12) - nD) / (nD * (nD - 1.0)) *
            lit(1e6)).cast("long").as("avg_cos_ppm")
        })
  }
}
