package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Two-proportion z-test per experiment group — the A/B-experiment
  * readout (does cohort B convert differently from cohort A?),
  * evaluated EXACTLY in integers like [[TimeSeries.anomalousCounts]]:
  * at z = 1.96 (95%), z² = 2401/625 is exactly rational, so
  *
  *   (p_a − p_b)² > z² · p(1−p) · (1/n_a + 1/n_b)
  *
  * cross-multiplies to
  *
  *   625 · (c_a·n_b − c_b·n_a)² · N  >  2401 · c·(N−c) · n_a·n_b
  *
  * with c = c_a+c_b, N = n_a+n_b — no sqrt, no float, the same
  * verdict under any partitioning or accumulation order. Products run
  * in DECIMAL(38,0), exact for cohort counts up to ~1e7 per group
  * (c·n ≤ ~1e14 keeps the squared term inside 38 digits); beyond
  * that, pre-aggregate or accept the double form.
  *
  * Scale: ONE map-side-combined groupBy over the events — conditional
  * sums, no join, no window. Output is group-cardinality-sized.
  */
object AbTest {

  /** Per-`groupCol` cohort counts and the significance verdict.
    * `inB` assigns the row's cohort; `success` is the conversion
    * predicate. Output: (group, n_a, c_a, n_b, c_b, winner) with
    * winner ∈ a|b|none — 'a' means cohort A's rate is significantly
    * higher at 95%.
    */
  def twoProportion(
      df: DataFrame, groupCol: String, inB: Column, success: Column)
      : DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(
        sum(when(!inB, 1L).otherwise(0L)).as("n_a"),
        sum(when(!inB && success, 1L).otherwise(0L)).as("c_a"),
        sum(when(inB, 1L).otherwise(0L)).as("n_b"),
        sum(when(inB && success, 1L).otherwise(0L)).as("c_b"))
    val d = DecimalType(38, 0)
    val diff = col("c_a") * col("n_b") - col("c_b") * col("n_a")
    val n = col("n_a") + col("n_b")
    val c = col("c_a") + col("c_b")
    val lhs = lit(625L).cast(d) * diff.cast(d) * diff.cast(d) * n.cast(d)
    val rhs = lit(2401L).cast(d) * c.cast(d) * (n - c).cast(d) *
      col("n_a").cast(d) * col("n_b").cast(d)
    agg.select(col(groupCol), col("n_a"), col("c_a"),
      col("n_b"), col("c_b"),
      when(lhs > rhs, when(diff > 0, "a").otherwise("b"))
        .otherwise("none").as("winner"))
  }
}
