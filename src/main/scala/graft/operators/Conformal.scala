package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals per group (Papadopoulos et
  * al. 2002; Vovk's inductive conformal) — the distribution-free
  * wrapper that turns ANY point predictor into calibrated intervals:
  * fit on the train split, take q̂ = the ⌈(1−α)(n+1)⌉-th smallest
  * absolute residual on the calibration split, and |y − ŷ| ≤ q̂ then
  * covers fresh exchangeable rows with probability ≥ 1−α. The audit
  * here reports q̂ AND the realized coverage on a held-out test
  * split — the number a pipeline alarms on when a feed drifts.
  *
  * The predictor is the engine's own closed-form [[GroupedOls]]
  * (per-group slope/intercept on the caller's integer lattice), so
  * the whole chain is deterministic: slope/intercept are 6-dp
  * decimals, each residual is one written IEEE sequence over exact
  * integers, and q̂ is EXACT ORDER-STATISTIC SELECTION under the
  * (residual, id) total order — never interpolated (engines agree
  * on selection, not interpolation). k caps at n_cal (a calibration
  * split smaller than ⌈(1−α)(n+1)⌉ has no finite-sample guarantee;
  * the cap reports the largest residual instead of infinity, and
  * the cap state is visible as k_rank = n_cal).
  *
  * Scale shape: one aggregation for the fit, one group-keyed window
  * over the calibration split for the selection, one
  * broadcast-joined coverage aggregation — nothing pairwise, no
  * collect.
  */
object Conformal {

  /** roleCol: 0 = train, 1 = calibration, 2 = test. Output per group
    * with a fitted model: (group, n_cal, k_rank, qhat, n_test,
    * n_covered, coverage_ppm), alpha = `alphaPpm`/1e6 (default 10%).
    */
  def splitConformal(
      df: DataFrame, groupCol: String, idCol: String,
      xCol: String, yCol: String, roleCol: String,
      alphaPpm: Long = 100000L): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L, s"alphaPpm: $alphaPpm")
    Reserved.check("input" -> df)
    val keep = 1000000L - alphaPpm
    val model = GroupedOls.fit(
        df.filter(col(roleCol) === 0), groupCol, xCol, yCol)
      .select(col(groupCol), col("slope"), col("intercept"))
    val scored = df.filter(col(roleCol) =!= 0)
      .join(model, groupCol)
      .select(col(groupCol), col(roleCol), col(idCol).as("__id"),
        abs(col(yCol).cast("double") -
          (col("slope") * col(xCol).cast("double") + col("intercept")))
          .as("__res"))
    val wR = Window.partitionBy(col(groupCol))
      .orderBy(col("__res"), col("__id"))
    val qhat = scored.filter(col(roleCol) === 1)
      .withColumn("__rk", row_number().over(wR))
      .withColumn("__ncal",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      // k = ceil((1-alpha)(n+1)) on the exact ppm lattice, capped
      .withColumn("__k", least(
        expr(s"($keep * (__ncal + 1) + 999999) div 1000000"),
        col("__ncal")))
      .filter(col("__rk") === col("__k"))
      .select(col(groupCol), col("__ncal").as("n_cal"),
        col("__k").as("k_rank"), col("__res").as("__qhat"))
    scored.filter(col(roleCol) === 2)
      .join(broadcast(qhat), groupCol)
      .groupBy(col(groupCol), col("n_cal"), col("k_rank"), col("__qhat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__res") <= col("__qhat"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col(groupCol), col("n_cal"), col("k_rank"),
        // micro-lattice snap, not round(x, 6) — the GroupedOls edge
        // convention (see its scaladoc for the cross-engine ROUND trap)
        (round(col("__qhat") * lit(1e6)).cast("long").cast("double")
          / lit(1e6)).as("qhat"), col("n_test"),
        col("n_covered"),
        expr("(n_covered * CAST(1000000 AS BIGINT)) div n_test")
          .as("coverage_ppm"))
  }
}
