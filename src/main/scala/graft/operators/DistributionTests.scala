package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution tests on exact integer lattices — the drift monitors
  * a data pipeline runs per feed, in the same no-sqrt/no-float
  * discipline as [[AbTest]] and [[TimeSeries.anomalousCounts]]:
  * every verdict is an integer (or DECIMAL) cross-multiplication, so
  * it replays bit-for-bit in any engine and under any partitioning.
  */
object DistributionTests {

  /** χ² goodness-of-fit against the UNIFORM distribution over the
    * observed categories: with k categories and n rows,
    *
    *   χ² = Σ (O−E)²/E  with E = n/k  =  Σ(k·O − n)² / (n·k)
    *
    * — an exact rational. Output: one row (k, n, chi2 rounded 6 dp,
    * verdict at the caller's 4-dp critical value for df = k−1:
    * `num·10⁴ > crit4·n·k` with num = Σ(k·O−n)²). One
    * map-side-combined count plus a k-row re-aggregation.
    */
  def chiSquareUniform(
      df: DataFrame, catCol: String, crit4: Long): DataFrame = {
    require(crit4 > 0, s"crit4: $crit4")
    val d = DecimalType(38, 0)
    val counts = df.groupBy(col(catCol)).agg(count(lit(1)).as("o"))
    counts
      .agg(count(lit(1)).as("k"), sum(col("o")).as("n"),
        sum((col("o").cast(d) * col("o").cast(d))).as("__oo"))
      // Σ(k·O−n)² = k²·ΣO² − 2kn·ΣO + k·n² = k²·ΣO² − k·n²
      // (since ΣO = n) — no second pass over the categories needed
      .select(col("k"), col("n"),
        (col("k").cast(d) * col("k").cast(d) * col("__oo") -
          col("k").cast(d) * col("n").cast(d) * col("n").cast(d))
          .as("__num"))
      .select(col("k"), col("n"),
        round(col("__num").cast("double") /
          (col("n").cast("double") * col("k").cast("double")), 6)
          .as("chi2"),
        when(col("__num") * lit(10000L).cast(d) >
          lit(crit4).cast(d) * col("n").cast(d) * col("k").cast(d),
          "nonuniform").otherwise("uniform").as("verdict"))
  }

  /** Two-sample Kolmogorov-Smirnov per group — the distribution-drift
    * test (did cohort B's metric distribution shift at all, not just
    * its mean?). The statistic is exact: ranking the merged sample
    * under a (value, tieCol) total order and running cohort counts
    * cumA/cumB, D = max|cumA·n_b − cumB·n_a| / (n_a·n_b) — integers
    * until the final division. D is evaluated after EVERY merged-order
    * row (a superset of the value-level jump points): under
    * cross-cohort value ties the tiebreak order can peak one row
    * higher than the value-level statistic, but the definition is a
    * total order, so it replays identically in any engine. The 95% verdict squares the classic
    * c(α)·√((n_a+n_b)/(n_a·n_b)) bound into
    *
    *   maxdiff²·10⁴ > 18442 · n_a·n_b·(n_a+n_b)
    *
    * (c = 1.358, c² = 1.8442 at 4 dp). One group-keyed window
    * exchange, one re-aggregation; NULL cohorts are dropped like
    * [[AbTest.rankSum]].
    */
  def ksTwoSample(
      df: DataFrame, groupCol: String, inB: Column,
      valueCol: String, tieCol: String): DataFrame = {
    Reserved.check("input" -> df)
    val d = DecimalType(38, 0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col(groupCol))
    val marked = df.where(inB.isNotNull)
      .select(col(groupCol), inB.as("__b"), col(valueCol), col(tieCol))
      .withColumn("__ca",
        sum(when(!col("__b"), 1L).otherwise(0L)).over(w))
      .withColumn("__cb",
        sum(when(col("__b"), 1L).otherwise(0L)).over(w))
      .withColumn("__na",
        sum(when(!col("__b"), 1L).otherwise(0L)).over(wg))
      .withColumn("__nb",
        sum(when(col("__b"), 1L).otherwise(0L)).over(wg))
    marked.groupBy(col(groupCol))
      .agg(
        max(col("__na")).as("n_a"),
        max(col("__nb")).as("n_b"),
        max(abs(col("__ca") * col("__nb") - col("__cb") * col("__na")))
          .as("__maxdiff"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        round(col("__maxdiff").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("ks_d"),
        when(col("__maxdiff").cast(d) * col("__maxdiff").cast(d) *
          lit(10000L).cast(d) >
          lit(18442L).cast(d) * col("n_a").cast(d) * col("n_b").cast(d) *
            (col("n_a") + col("n_b")).cast(d),
          "shifted").otherwise("same").as("verdict"))
  }
}
