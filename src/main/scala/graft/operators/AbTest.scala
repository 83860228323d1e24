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

  /** Mann-Whitney U (Wilcoxon rank-sum) per group — the nonparametric
    * two-sample test for a SHIFT in a numeric metric, where
    * [[twoProportion]] compares conversion rates. Ranks are assigned
    * under the (value, tieCol) total order (unique ranks, so no
    * tie-correction term), making U a pure integer:
    *
    *   U = R_b − n_b(n_b+1)/2,   μ = n_a·n_b/2,
    *   σ² = n_a·n_b·(N+1)/12
    *
    * and the 95% verdict cross-multiplies (z² = 2401/625) to
    *
    *   1875 · (2U − n_a·n_b)²  >  2401 · n_a·n_b · (N+1)
    *
    * — integers end to end, DECIMAL(38,0) interior. One window
    * exchange keyed by the group (rank), one re-aggregation. Rows
    * whose `inB` evaluates NULL are dropped before ranking — counted
    * in neither cohort, they would still consume ranks and corrupt U.
    */
  def rankSum(
      df: DataFrame, groupCol: String, inB: Column,
      valueCol: String, tieCol: String): DataFrame = {
    Reserved.check("input" -> df)
    val d = DecimalType(38, 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    val ranked = df.where(inB.isNotNull)
      .select(col(groupCol), inB.as("__b"),
        col(valueCol), col(tieCol))
      .withColumn("__r", row_number().over(w).cast("long"))
    val agg = ranked.groupBy(col(groupCol))
      .agg(
        sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__b"), col("__r")).otherwise(0L)).as("__rb"))
    // work on 2U to stay in integers (Column `/` is double division);
    // 2U = 2·R_b − n_b(n_b+1), always even, so U = 2U div 2 is exact
    val u2 = lit(2L) * col("__rb") - col("n_b") * (col("n_b") + 1)
    val dev = u2 - col("n_a") * col("n_b")
    val lhs = lit(1875L).cast(d) * dev.cast(d) * dev.cast(d)
    val rhs = lit(2401L).cast(d) * col("n_a").cast(d) *
      col("n_b").cast(d) * (col("n_a") + col("n_b") + 1).cast(d)
    agg.select(col(groupCol), col("n_a"), col("n_b"),
      u2.divide(lit(2)).cast("long").as("u"),
      when(lhs > rhs, when(dev > 0, "b_high").otherwise("b_low"))
        .otherwise("none").as("verdict"))
  }

  /** Wald sequential probability ratio test per group (Wald 1945) —
    * CONTINUOUS A/B monitoring with early stopping: unlike the
    * fixed-horizon [[twoProportion]], SPRT may be evaluated after
    * every batch without inflating the error rates — the boundaries
    * A = log((1−β)/α), B = log(β/(1−α)) carry the α/β guarantees at
    * ANY stopping time (Wald's optional-stopping theorem), which is
    * exactly what a feed-health monitor that looks every hour needs.
    *
    * For Bernoulli outcomes the log-likelihood ratio is linear in
    * the sufficient statistics:
    *
    *   LLR = c·log(p₁/p₀) + (n−c)·log((1−p₁)/(1−p₀))
    *
    * The two per-observation log terms and both boundaries are
    * snapped ONCE to the log10 micro lattice at plan build (driver
    * constants — the engine's cross-engine-proven log primitive is
    * log10, and the base cancels between LLR and boundaries), so
    * LLR is an EXACT integer linear form in (n, c): no float at
    * runtime, one map-side-combined aggregate per group, trivially
    * scale-safe and oracle-replayable with the same pinned
    * constants. NULL outcomes count as failures (the
    * [[twoProportion]] convention).
    *
    * Output: (group, n, successes, llr_micro, decision) with
    * decision ∈ accept_h1 | accept_h0 | continue.
    */
  def sprt(
      df: DataFrame, groupCol: String, success: Column,
      p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"sprt: need 0 < p0 != p1 < 1, got p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"sprt: need alpha, beta in (0,1), got $alpha / $beta")
    sprtDecision(
      df.groupBy(col(groupCol))
        .agg(count(lit(1)).as("n"),
          sum(when(success, 1L).otherwise(0L)).as("successes")),
      groupCol, p0, p1, alpha, beta)
  }

  /** The SPRT output edge over a pre-aggregated (group, n,
    * successes) frame — the pinned-lattice LLR and boundary
    * decision. Shared by [[sprt]] (batch aggregate) and the
    * streaming twin (stateful fold), so both read the SAME
    * constants and the twins share one oracle.
    */
  def sprtDecision(
      counts: DataFrame, groupCol: String,
      p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"sprt: need 0 < p0 != p1 < 1, got p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"sprt: need alpha, beta in (0,1), got $alpha / $beta")
    val l1 = math.round(math.log10(p1 / p0) * 1e6)
    val l0 = math.round(math.log10((1 - p1) / (1 - p0)) * 1e6)
    val aBound = math.round(math.log10((1 - beta) / alpha) * 1e6)
    val bBound = math.round(math.log10(beta / (1 - alpha)) * 1e6)
    val llr = col("successes") * lit(l1) +
      (col("n") - col("successes")) * lit(l0)
    counts.select(col(groupCol), col("n"), col("successes"),
      llr.as("llr_micro"),
      when(llr >= lit(aBound), "accept_h1")
        .when(llr <= lit(bBound), "accept_h0")
        .otherwise("continue").as("decision"))
  }

  /** CUPED variance-reduced A/B readout per group (Deng, Xu, Kohavi
    * & Walker 2013) — the industry-standard sensitivity boost: a
    * pre-experiment covariate X (last period's activity) explains
    * away ρ² of the metric Y's variance, so the adjusted metric
    * Y' = Y − θ·(X − X̄) detects the same lift with (1−ρ²)× the
    * sample. θ = cov(X,Y)/var(X) is computed on the POOLED units
    * (the paper's recommendation — under randomization X is
    * independent of assignment, so pooling is unbiased).
    *
    * Exactness: X and Y arrive on an integer lattice (cents); every
    * sufficient statistic (n, ΣX, ΣY, and the DECIMAL(38,0)
    * products ΣXY, ΣX², ΣY²) is an exact order-free integer, the
    * textbook identities n·ΣXY − ΣX·ΣY etc. stay exact in DECIMAL,
    * and θ, the raw/adjusted cohort mean differences, and
    * ρ² = cov²/(varX·varY) are each ONE written IEEE sequence over
    * those integers, snapped at the edge. Units with NULL cohort OR
    * NULL x OR NULL y drop entirely (the [[rankSum]] convention —
    * never a unit that n counts but the sums skip). Shape: two
    * map-side-combined aggregates to group-cardinality rows —
    * scale-free.
    *
    * Output: (group, n, n_a, n_b, theta_micro, raw_diff_micro,
    * adj_diff_micro, rho2_ppm); groups need both cohorts populated
    * and nonzero var(X), var(Y).
    */
  def cuped(
      df: DataFrame, groupCol: String, inB: Column,
      xCol: String, yCol: String): DataFrame = {
    Reserved.check("input" -> df)
    Seq(xCol, yCol).foreach { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => ()
        case dt => throw new IllegalArgumentException(
          s"cuped: column '$c' is $dt; put the metric on an integer " +
            "lattice first (the GroupedOls.fit policy)")
      }
    }
    val d38 = DecimalType(38, 0)
    // NULL x or y drops the whole UNIT (the rankSum convention):
    // sum() would skip the NULL while count() still counted the row,
    // silently biasing theta/raw_diff/adj_diff/rho2 against their
    // own n — the family's NULL policy is drop-the-row or refuse,
    // never a half-counted unit.
    val rows = df.where(inB.isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), inB.as("__b"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val agg = rows.groupBy(col("__g")).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x").cast(d38) * col("__y").cast(d38)).as("__sxy"),
      sum(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"),
      sum(col("__y").cast(d38) * col("__y").cast(d38)).as("__syy"),
      sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("__b"), col("__x")).otherwise(0L)).as("__sxa"),
      sum(when(col("__b"), col("__x")).otherwise(0L)).as("__sxb"),
      sum(when(!col("__b"), col("__y")).otherwise(0L)).as("__sya"),
      sum(when(col("__b"), col("__y")).otherwise(0L)).as("__syb"))
    val nD = col("n").cast(d38)
    val covNum = nD * col("__sxy") - col("__sx").cast(d38) *
      col("__sy").cast(d38)
    val varXNum = nD * col("__sxx") - col("__sx").cast(d38) *
      col("__sx").cast(d38)
    val varYNum = nD * col("__syy") - col("__sy").cast(d38) *
      col("__sy").cast(d38)
    val theta = covNum.cast("double") / varXNum.cast("double")
    val rawDiff = col("__syb").cast("double") / col("n_b").cast("double") -
      col("__sya").cast("double") / col("n_a").cast("double")
    val xDiff = col("__sxb").cast("double") / col("n_b").cast("double") -
      col("__sxa").cast("double") / col("n_a").cast("double")
    val rho2 = covNum.cast("double") * covNum.cast("double") /
      (varXNum.cast("double") * varYNum.cast("double"))
    def snap(c: Column) = round(c * lit(1e6)).cast("long")
    agg
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("__vx", varXNum).withColumn("__vy", varYNum)
      .filter(col("__vx") > 0 && col("__vy") > 0)
      .select(col("__g").as(groupCol), col("n"), col("n_a"), col("n_b"),
        snap(theta).as("theta_micro"),
        snap(rawDiff).as("raw_diff_micro"),
        snap(rawDiff - theta * xDiff).as("adj_diff_micro"),
        snap(rho2).as("rho2_ppm"))
  }

  /** Per-`groupCol` cohort counts and the significance verdict.
    * `inB` assigns the row's cohort; `success` is the conversion
    * predicate. Output: (group, n_a, c_a, n_b, c_b, winner) with
    * winner ∈ a|b|none — 'a' means cohort A's rate is significantly
    * higher at 95%. Rows with NULL `inB` join neither cohort; a NULL
    * `success` counts as a non-conversion.
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

  /** Mixture SPRT for CONTINUOUS metrics (Johari, Koomen, Pekelis &
    * Walsh 2017 — the "always-valid inference" industry standard):
    * where [[sprt]] monitors a Bernoulli rate, mSPRT monitors a mean
    * difference under continuous peeking with the α guarantee intact
    * at ANY stopping rule. The normal-mixture likelihood ratio over
    * H0: δ = 0 with mixing prior N(0, τ²) is
    *
    *   Λ = √(s²/(s²+τ²)) · exp(δ̂²τ²/(2s²(s²+τ²)))
    *
    * with δ̂ the cohort mean difference and s² its plug-in variance
    * (pooled two-sample); reject when Λ ≥ 1/α (always-valid
    * p = 1/Λ ≤ α).
    *
    * Exactness: per-cohort sufficient statistics (n, Σx, and
    * DECIMAL(38,0) Σx²) are exact order-free integers and the
    * textbook identity n·Σx² − (Σx)² stays exact in DECIMAL (the
    * [[cuped]] contract); τ² enters as the exact rational
    * tauMicro²/10¹², and log₁₀Λ is ONE written IEEE sequence over
    * those integers (log10/exp ride the q_nb transcendental
    * precedent), snapped to micro. The reject boundary is the
    * driver-computed integer −round(log₁₀(α)·10⁶), so the decision
    * is an exact integer comparison. Units with NULL cohort or
    * value drop (the [[rankSum]] convention).
    *
    * Shared by the batch aggregate ([[msprt]]) and the streaming
    * fold through [[msprtDecision]] — both read the same constants,
    * so the twins share one oracle.
    *
    * Output: (group, n_a, n_b, delta_micro, llr10_micro, decision ∈
    * reject_h0 | continue) — groups with ≥ 2 units per cohort and a
    * positive variance.
    */
  def msprt(
      df: DataFrame, groupCol: String, inB: Column, valueCol: String,
      tauMicro: Long, alphaPpm: Long = 50000L): DataFrame = {
    Reserved.check("units" -> df)
    // A fractional value column would silently truncate at the long
    // cast — refuse eagerly (the rankSum/cuped input policy).
    NonParametric.requireIntegral(df, valueCol)
    val counts = df
      .filter(inB.isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), inB.as("__b"),
        col(valueCol).cast("long").as("__x"))
      .groupBy(col(groupCol))
      .agg(
        sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("__b"), col("__x")).otherwise(0L)).as("sx_a"),
        sum(when(col("__b"), col("__x")).otherwise(0L)).as("sx_b"),
        sum(when(!col("__b"),
          col("__x").cast(DecimalType(38, 0)) * col("__x"))
          .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("sxx_a"),
        sum(when(col("__b"),
          col("__x").cast(DecimalType(38, 0)) * col("__x"))
          .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("sxx_b"))
    msprtDecision(counts, groupCol, tauMicro, alphaPpm)
  }

  /** The mSPRT output edge over a pre-aggregated (group, n_a, n_b,
    * sx_a, sx_b, sxx_a, sxx_b) frame — see [[msprt]].
    */
  def msprtDecision(
      counts: DataFrame, groupCol: String,
      tauMicro: Long, alphaPpm: Long = 50000L): DataFrame = {
    require(tauMicro > 0, s"msprt: tauMicro must be positive")
    require(alphaPpm > 0 && alphaPpm < 1000000L, s"alphaPpm: $alphaPpm")
    val d38 = DecimalType(38, 0)
    val thr = math.round(-math.log10(alphaPpm / 1e6) * 1e6)
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val vaNum = col("n_a").cast(d38) * col("sxx_a") -
      col("sx_a").cast(d38) * col("sx_a").cast(d38)
    val vbNum = col("n_b").cast(d38) * col("sxx_b") -
      col("sx_b").cast(d38) * col("sx_b").cast(d38)
    val sig2 = (vaNum.cast("double") / naD + vbNum.cast("double") / nbD) /
      (naD + nbD - lit(2.0))
    val s2 = sig2 * (naD + nbD) / (naD * nbD)
    val tau2 = lit(tauMicro * tauMicro).cast("double") / lit(1e12)
    val delta = col("sx_b").cast("double") / nbD -
      col("sx_a").cast("double") / naD
    val llr10 = lit(0.5) * log10(s2 / (s2 + tau2)) +
      delta * delta * tau2 / (lit(2.0) * s2 * (s2 + tau2)) /
        lit(2.302585092994046)
    counts
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .withColumn("__s2", s2)
      .filter(col("__s2") > 0.0)
      .select(col(groupCol), col("n_a"), col("n_b"),
        round(delta * lit(1e6)).cast("long").as("delta_micro"),
        round(llr10 * lit(1e6)).cast("long").as("llr10_micro"),
        when(round(llr10 * lit(1e6)).cast("long") >= thr, "reject_h0")
          .otherwise("continue").as("decision"))
  }

  /** Standardized mean difference (SMD / Cohen's d with pooled-SD
    * denominator √((v_a+v_b)/2)) per group — the covariate BALANCE
    * check run before trusting any A/B readout: a significant
    * [[welchT]] on the OUTCOME means nothing if the cohorts already
    * differed on a pre-treatment covariate, and SMD is the scale-free
    * number balance tables report (|SMD| < 0.1 is the conventional
    * "balanced" band). Exactness: per-cohort (n, Σx, DECIMAL Σx²)
    * are exact; the textbook variance identity
    * vᵢ = (nᵢΣx² − S²)/(nᵢ(nᵢ−1)) and the SMD edge are ONE written
    * IEEE sequence, micro-snapped; the verdict compares the SNAPPED
    * |smd_micro| to 100000 — an integer comparison both engines
    * replay. Cohorts under 2 rows or zero pooled variance drop.
    *
    * Output: (group, n_a, n_b, smd_micro, verdict ∈ balanced |
    * imbalanced). Shape: ONE map-side-combined aggregation.
    */
  def smdBalance(
      df: DataFrame, groupCol: String, inB: Column,
      valueCol: String): DataFrame = {
    Reserved.check("input" -> df)
    NonParametric.requireIntegral(df, valueCol)
    val d38 = DecimalType(38, 0)
    smdFromCounts(
      df.filter(inB.isNotNull && col(valueCol).isNotNull)
        .select(col(groupCol), inB.as("__b"),
          col(valueCol).cast("long").as("__x"))
        .groupBy(col(groupCol))
        .agg(
          sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("__b"), col("__x")).otherwise(0L)).as("__sxa"),
          sum(when(!col("__b"), col("__x").cast(d38) * col("__x").cast(d38))
            .otherwise(lit(0L).cast(d38))).as("__sxxa"),
          sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
          sum(when(col("__b"), col("__x")).otherwise(0L)).as("__sxb"),
          sum(when(col("__b"), col("__x").cast(d38) * col("__x").cast(d38))
            .otherwise(lit(0L).cast(d38))).as("__sxxb")),
      groupCol)
  }

  /** [[smdBalance]]'s combine over already-aggregated per-cohort
    * sufficient statistics `(groupCol, n_a, __sxa, __sxxa, n_b,
    * __sxb, __sxxb)` — the six exact sums are a pure commutative
    * fold, so the streaming twin accumulates them in O(1) state and
    * replays THIS code at every trigger, sharing the batch oracle.
    */
  def smdFromCounts(perGroup: DataFrame, groupCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val counts = perGroup.filter(col("n_a") >= 2 && col("n_b") >= 2)
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val va = (col("n_a").cast(d38) * col("__sxxa") -
      col("__sxa").cast(d38) * col("__sxa").cast(d38)).cast("double") /
      (naD * (naD - lit(1.0)))
    val vb = (col("n_b").cast(d38) * col("__sxxb") -
      col("__sxb").cast(d38) * col("__sxb").cast(d38)).cast("double") /
      (nbD * (nbD - lit(1.0)))
    val smd = (col("__sxa").cast("double") / naD -
      col("__sxb").cast("double") / nbD) /
      sqrt((va + vb) / lit(2.0))
    val smdMicro = round(smd * lit(1e6)).cast("long")
    counts
      .withColumn("__pool", va + vb)
      .filter(col("__pool") > 0.0)
      .select(col(groupCol), col("n_a"), col("n_b"),
        smdMicro.as("smd_micro"),
        when(abs(smdMicro) < 100000L, "balanced")
          .otherwise("imbalanced").as("verdict"))
  }

  /** Wilson score interval (Wilson 1927) for a per-group conversion
    * rate at 95% — the proportion CI that behaves at the edges where
    * the Wald interval fails (p̂ near 0/1, small n: Wald collapses
    * to zero width at c = 0; Wilson never leaves [0, 1]):
    *
    *   (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n),  z = 1.96
    *
    * Exactness: (n, c) per group are exact counts; lo/hi are ONE
    * written IEEE sequence each over those integers (√ is a single
    * correctly-rounded IEEE op — both engines agree bit-for-bit),
    * snapped to the micro lattice. Rows with NULL success drop; any
    * n ≥ 1 is valid (the whole point of Wilson).
    *
    * Output: (group, n, c, lo_micro, hi_micro). Shape: ONE
    * map-side-combined aggregation, group-cardinality-sized output.
    */
  def wilsonCi(
      df: DataFrame, groupCol: String, success: Column): DataFrame = {
    Reserved.check("input" -> df)
    val agg = df.where(success.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("c"))
    val nD = col("n").cast("double")
    val p = col("c").cast("double") / nD
    val z = lit(1.96)
    val denom = lit(1.0) + z * z / nD
    val center = (p + z * z / (lit(2.0) * nD)) / denom
    val half = z * sqrt(p * (lit(1.0) - p) / nD +
      z * z / (lit(4.0) * nD * nD)) / denom
    agg.select(col(groupCol), col("n"), col("c"),
      round((center - half) * lit(1e6)).cast("long").as("lo_micro"),
      round((center + half) * lit(1e6)).cast("long").as("hi_micro"))
  }

  /** Cochran-Mantel-Haenszel test (Mantel & Haenszel 1959) — the
    * STRATIFIED two-proportion test: does cohort B convert
    * differently from A after controlling for a confounding stratum
    * (source, country, device)? A pooled [[twoProportion]] can point
    * the WRONG WAY when strata differ in both mix and base rate
    * (Simpson's paradox); CMH compares each stratum's 2×2 table
    * against its own hypergeometric expectation and sums:
    *
    *   per stratum: O = n₁₁,  E = n₁₊·n₊₁/n,
    *                V = n₁₊·n₀₊·n₊₁·n₊₀ / (n²(n−1))
    *   CMH = (ΣO − ΣE)² / ΣV   ~ χ²(1)   (no continuity correction)
    *
    * Exactness: the [[graft.operators.Survival.logRank]] lattice —
    * per-stratum counts are exact longs; E rides the div+remnano
    * split (integer quotient DECIMAL-summed, remainder fraction
    * nano-snapped and integer-summed); each V is ONE written IEEE
    * sequence of exact integers snapped alone to nano and
    * integer-summed (order-free under any partitioning); the χ² edge
    * is one IEEE sequence at the micro lattice, and the verdict is
    * the integer comparison chi2_micro > crit4·100 against the
    * caller's 4-dp χ²(1) critical value. n₁₊·n₊₁ runs in long —
    * exact to ~3·10⁹ rows per stratum (the logRank d·n bound).
    *
    * Shape: ONE map-side-combined aggregation to stratum rows, then
    * a stratum-count-sized re-aggregation — no join, no window.
    * Strata with n < 2 drop (V undefined); rows with NULL cohort or
    * outcome drop (the [[rankSum]] convention). Output: one row
    * (k_strata, o, e_nano, v_nano, chi2_micro, verdict); ΣV = 0
    * (every stratum degenerate) yields no row.
    */
  def cmh(
      df: DataFrame, strataCol: String, inB: Column, success: Column,
      crit4: Long = 38415L): DataFrame = {
    Reserved.check("input" -> df)
    cmhFromCounts(
      df.filter(inB.isNotNull && success.isNotNull)
        .select(col(strataCol).as("__s"), inB.as("__b"), success.as("__y"))
        .groupBy(col("__s"))
        .agg(count(lit(1)).as("__n"),
          sum(when(col("__b"), 1L).otherwise(0L)).as("__n1"),
          sum(when(col("__y"), 1L).otherwise(0L)).as("__m1"),
          sum(when(col("__b") && col("__y"), 1L).otherwise(0L)).as("__o")),
      crit4)
  }

  /** [[cmh]]'s combine over an already-aggregated per-stratum count
    * table `(__n, __n1, __m1, __o)` — the four counts per stratum
    * are the test's complete sufficient statistics (a pure
    * commutative integer fold), so the streaming twin accumulates
    * them in per-stratum state and replays THIS code at every
    * trigger, sharing the batch oracle. The div+remnano E lattice,
    * nano V terms, and the micro χ² edge are identical to the batch
    * path by construction; strata with n < 2 drop here so both
    * paths agree on the refusal.
    */
  def cmhFromCounts(perStratum: DataFrame, crit4: Long): DataFrame = {
    require(crit4 > 0, s"crit4: $crit4")
    val d38 = DecimalType(38, 0)
    val per = perStratum.filter(col("__n") >= 2)
    val terms = per.select(col("__o"),
      expr("(__n1 * __m1) div __n").as("__eq"),
      round(pmod(col("__n1") * col("__m1"), col("__n")).cast("double") /
        col("__n").cast("double") * lit(1e9)).cast("long").as("__er"),
      round(col("__n1").cast("double") *
        (col("__n") - col("__n1")).cast("double") *
        col("__m1").cast("double") *
        (col("__n") - col("__m1")).cast("double") /
        (col("__n").cast("double") * col("__n").cast("double") *
          (col("__n").cast("double") - lit(1.0))) * lit(1e9))
        .cast("long").as("__vn"))
    val dev = col("o").cast("double") -
      (col("__eqsum").cast("double") +
        col("__ersum").cast("double") / lit(1e9))
    val chi2Micro = round(dev * dev /
      (col("v_nano").cast("double") / lit(1e9)) * lit(1e6)).cast("long")
    terms
      .agg(count(lit(1)).as("k_strata"),
        sum(col("__o")).as("o"),
        sum(col("__eq").cast(d38)).as("__eqsum"),
        sum(col("__er")).as("__ersum"),
        sum(col("__vn")).as("v_nano"))
      .filter(col("v_nano") > 0)
      .select(col("k_strata"), col("o"),
        (col("__eqsum").cast("long") * lit(1000000000L) +
          col("__ersum")).as("e_nano"),
        col("v_nano"),
        chi2Micro.as("chi2_micro"),
        when(chi2Micro > lit(crit4 * 100L), "dependent")
          .otherwise("independent").as("verdict"))
  }
}
