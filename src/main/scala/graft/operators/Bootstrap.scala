package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals — THE bootstrap that works
  * at corpus scale: instead of materializing B resamples (B corpus
  * shuffles), each row draws a Poisson(1) weight per replicate
  * row-locally, and a single map-side-combined aggregation yields all
  * B replicate statistics at once. Output is B-sized; the corpus is
  * read exactly once.
  *
  * Determinism: the per-(row, replicate) uniform comes from a 31-bit
  * LCG over integer row ids — pure modular arithmetic both engines
  * evaluate exactly (every product stays under 2^63) — and the
  * Poisson(1) inverse-CDF thresholds are fixed 6-dp literals, so the
  * weights, the replicate rates, and the order statistics replay
  * bit-for-bit in any engine. Rate ties across replicates break on
  * the replicate id (total order).
  *
  * The interval: rank the B replicate rates; report the 2.5th
  * percentile, median, and 97.5th percentile replicates (ranks
  * ceil(0.025·B), B/2, floor(0.975·B)+1 — exact order statistics,
  * not interpolation, so no float summation anywhere).
  */
object Bootstrap {

  /** Poisson(1) CDF at k = 0..5, to 6 dp; weights are capped at 6
    * (P(X>6) ≈ 1e-4 — the tail a 6-dp lattice cannot see anyway).
    */
  private val poissonCdf6 =
    Seq(0.367879, 0.735759, 0.919699, 0.981012, 0.996340, 0.999406)

  /** 31-bit mixed-congruential uniform in [0, 1) for (idCol,
    * replicate). A single LCG step is NOT enough here: sequential ids
    * differ by a constant mod 2^31, and a linear map preserves that
    * lattice — per-replicate weight sums become near-constant and the
    * bootstrap variance collapses (~6× too narrow in testing). The
    * xor between modular steps breaks the linearity; the scheme
    * reproduces the binomial CI width to within a few percent.
    */
  private def u01(id: Column, rep: Column): Column = {
    val m = 2147483648L // 2^31
    // reduce id mod 2^31 BEFORE the multiply: a raw id ≥ ~3.5e9 would
    // overflow Long in id*2654435761 (Spark wraps silently, DuckDB
    // errors); (id % m)·2654435761 ≤ 5.7e18 stays inside 2^63
    val a = ((id % lit(m)) * lit(2654435761L)) % lit(m)
    val b = ((rep % lit(m)) * lit(2246822519L)) % lit(m)
    val s = a.bitwiseXOR(b)
    val s1 = (s * lit(1103515245L) + lit(12345L)) % lit(m)
    val s2 = s1.bitwiseXOR(shiftright(s1, 15))
    val s3 = (s2 * lit(32310901L) + lit(1013904223L)) % lit(m)
    s3.cast("double") / lit(m.toDouble)
  }

  /** Bootstrap the success RATE of boolean `success` over `df` with
    * `b` Poisson replicates. `idCol` must be a non-negative integer
    * id (the PRNG seed per row). Output: one row per reported order
    * statistic — (stat ∈ p025|p500|p975, rep, n_eff, rate) where
    * `rep` is the winning replicate and n_eff its resample size.
    */
  def rateCI(df: DataFrame, idCol: String, success: Column, b: Int)
      : DataFrame = {
    require(b >= 40, s"b: $b (need ≥ 40 for a 2.5% tail rank)")
    Reserved.check("input" -> df)
    val weighted = df
      .select(col(idCol).as("__id"), when(success, 1L).otherwise(0L).as("__s"))
      .select(col("__id"), col("__s"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .withColumn("__u", u01(col("__id"), col("rep")))
      .withColumn("__w",
        // reverse fold so the SMALLEST threshold is the outermost
        // branch — the inverse-CDF must test cdf(0) first
        poissonCdf6.zipWithIndex.reverse.foldLeft(lit(6)) {
          case (acc, (p, k)) => when(col("__u") < p, k).otherwise(acc)
        }.cast("long"))
    val rates = weighted
      .groupBy(col("rep"))
      .agg(sum(col("__w") * col("__s")).as("__c"), sum(col("__w")).as("n_eff"))
      .select(col("rep"), col("n_eff"),
        round(col("__c").cast("double") / col("n_eff"), 6).as("rate"))
    val ranked = rates.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("rate"), col("rep"))))
    val lo = math.ceil(0.025 * b).toLong
    val med = b / 2L
    val hi = math.floor(0.975 * b).toLong + 1L
    ranked
      .filter(col("__rn").isin(lo, med, hi))
      .select(
        when(col("__rn") === lo, "p025")
          .when(col("__rn") === med, "p500")
          .otherwise("p975").as("stat"),
        col("rep"), col("n_eff"), col("rate"))
  }
}
