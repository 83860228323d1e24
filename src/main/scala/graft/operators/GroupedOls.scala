package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group simple linear regression by the exact closed form —
  * "fit thousands of small models in one pass", the grouped-ML shape
  * (per-source calibration curves, per-tenant trends) that needs no
  * iterative solver:
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
  *   intercept = (Σy − slope·Σx)/n,
  *   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
  *
  * Determinism: x and y are cast to LONG, so the five sufficient
  * statistics are exact integer aggregates (order-free); every
  * integer here stays below 2^53, so the double arithmetic on them
  * is exact and the outputs are pure functions of five integers —
  * bit-replayable in any engine. At magnitudes where n·Σx² would
  * pass 2^53, move the sums to DECIMAL and the products to HUGEINT
  * (the engine's squared-lattice convention) before trusting the
  * hash edge.
  *
  * Scale shape: ONE map-side-combined aggregation over the corpus —
  * the model count is the group count, and no group's data ever
  * gathers anywhere.
  */
object GroupedOls {

  /** (groupCol, n, slope, intercept, r2), 6-dp at the edge. Groups
    * with a degenerate x (zero variance) or fewer than 2 rows are
    * excluded — their slope is undefined in any engine.
    */
  def fit(
      df: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame = {
    Reserved.check("fit" -> df)
    val stats = df
      .select(col(groupCol),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    stats
      .filter(col("__n") >= 2 && varx =!= lit(0.0))
      .select(col(groupCol), col("__n").as("n"),
        round(cov / varx, 6).as("slope"),
        round((sy - (cov / varx) * sx) / n, 6).as("intercept"),
        when(vary === lit(0.0), lit(null))
          .otherwise(round((cov * cov) / (varx * vary), 6)).as("r2"))
  }
}
