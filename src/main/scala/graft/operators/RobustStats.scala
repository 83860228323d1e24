package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winsorized (percentile-clipped) robust statistics per group — the
  * outlier treatment a metrics pipeline applies before averaging
  * heavy-tailed numerics (latencies, prices, token counts): clip to
  * the group's own [pLo, pHi] percentiles, then aggregate, so a
  * single corrupt row cannot move the mean arbitrarily.
  *
  * Cross-engine exactness: the percentile boundaries are the ONLY
  * float in the chain and are snapped immediately to an integer
  * micro lattice (×1e6, round-to-integer — the engine-agnostic form;
  * `ROUND(x, 6)` itself skews between engines at these magnitudes).
  * Values enter micro space by exact decimal scaling, clipping is
  * integer min/max, and the winsorized mean is integer floor
  * division — nothing downstream of the snap can diverge.
  *
  * Scale: one exact-percentile aggregation (per-group value
  * histogram — fine to low GBs per group; at 100 TB swap
  * `percentile` for `approx_percentile`, the proven GK path of
  * q_quantile_sketch, and keep everything else), then a broadcast
  * join of the group-count-sized boundary table back onto the scan.
  */
object RobustStats {

  /** (groupCol, n, lo_micro, hi_micro, n_lo, n_hi, wmean_micro):
    * clip boundaries, clipped-row counts on each side, and the
    * winsorized mean — all on the integer micro lattice. The mean is
    * integer `div` (truncation), which equals floor on the
    * non-negative domains this targets; a negative-valued domain
    * must align division semantics with its replay engine (Spark
    * `div` truncates toward zero, SQL `//` floors).
    */
  def winsorizedMean(
      df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"percentiles: $pLo,$pHi")
    Reserved.check("df" -> df)
    val bounds = df.groupBy(col(groupCol))
      .agg(
        round(expr(s"percentile(CAST($valueCol AS DOUBLE), $pLo)")
          * lit(1e6)).cast("long").as("lo_micro"),
        round(expr(s"percentile(CAST($valueCol AS DOUBLE), $pHi)")
          * lit(1e6)).cast("long").as("hi_micro"))
    val xMicro = (col(valueCol) * lit(1000000)).cast("long")
    df.join(broadcast(bounds), groupCol)
      .select(col(groupCol), col("lo_micro"), col("hi_micro"),
        xMicro.as("__x"),
        greatest(col("lo_micro"), least(col("hi_micro"), xMicro))
          .as("__cv"))
      .groupBy(col(groupCol), col("lo_micro"), col("hi_micro"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__x") < col("lo_micro"), 1L).otherwise(0L))
          .as("n_lo"),
        sum(when(col("__x") > col("hi_micro"), 1L).otherwise(0L))
          .as("n_hi"),
        sum(col("__cv")).as("__sum"))
      .select(col(groupCol), col("n"), col("lo_micro"), col("hi_micro"),
        col("n_lo"), col("n_hi"),
        expr("__sum div n").as("wmean_micro"))
  }
}
