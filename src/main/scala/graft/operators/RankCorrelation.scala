package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spearman rank correlation per group — the monotone-association
  * monitor (does doc length track token count within each source?)
  * that is robust to outliers and nonlinearity where Pearson
  * (q_correlation) is not.
  *
  * Determinism: ties take the AVERAGE rank (the classical Spearman
  * convention). Average ranks are half-integers, so both variables
  * ride a doubled-rank integer lattice:
  *
  *   r2 = 2·rank_min + (tieCount − 1)
  *
  * (a tie block occupying positions p..p+c−1 has average p+(c−1)/2,
  * doubled = 2p+c−1 — an exact integer). Scaling both variables by
  * ½ cancels in the correlation, so Pearson over the doubled ranks
  * IS Spearman. The five sufficient statistics are exact integer /
  * DECIMAL(38) aggregates (order-free); the final combine casts each
  * exact sum to double once and applies one written IEEE op sequence,
  * mirrored verbatim in the oracle SQL — the q_correlation policy.
  *
  * Scale shape: two rank windows per variable, each a shuffle on
  * (group) with an in-partition sort — no all-pairs, no collect. A
  * single group too large for one task moves to the sharded
  * range-rank decomposition (GlobalIds.assignIds): range-exchange on
  * the value, local ranks, broadcast per-shard prefix counts.
  */
object RankCorrelation {

  /** (groupCol, n, rho) for each group with ≥ 2 rows and nonzero rank
    * variance on both sides, 6-dp at the edge.
    */
  def spearman(
      df: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame = {
    Reserved.check("spearman" -> df)
    val d38 = DecimalType(38, 0)
    def doubledRank(c: String) = {
      val wRank = Window.partitionBy(col(groupCol)).orderBy(col(c))
      val wTie = Window.partitionBy(col(groupCol), col(c))
      lit(2L) * rank().over(wRank).cast("long") +
        count(lit(1)).over(wTie).cast("long") - lit(1L)
    }
    val ranked = df
      .select(col(groupCol), col(xCol).as("__xv"), col(yCol).as("__yv"))
      .select(col(groupCol),
        doubledRank("__xv").as("__rx"), doubledRank("__yv").as("__ry"))
    val stats = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__rx")).as("__sx"), sum(col("__ry")).as("__sy"),
        sum((col("__rx").cast(d38) * col("__ry").cast(d38))).as("__sxy"),
        sum((col("__rx").cast(d38) * col("__rx").cast(d38))).as("__sxx"),
        sum((col("__ry").cast(d38) * col("__ry").cast(d38))).as("__syy"))
    val nD = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val cov = nD * sxy - sx * sy
    val varx = nD * sxx - sx * sx
    val vary = nD * syy - sy * sy
    stats
      .filter(col("n") >= 2 && varx =!= lit(0.0) && vary =!= lit(0.0))
      .select(col(groupCol), col("n"),
        round(cov / sqrt(varx * vary), 6).as("rho"))
  }
}
