package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline change-point detection and autocorrelation over grouped
  * integer series — the monitoring layer a corpus-ingest pipeline
  * runs over its own volume/quality counters (per-source daily doc
  * counts, dedup rates, rejection rates).
  *
  * CUSUM (Page 1954, offline single-change form): for a series
  * x_1..x_n with mean x̄, S_i = Σ_{j≤i}(x_j − x̄); the change point
  * estimate is argmax_i |S_i| — where the cumulative deviation from
  * the global mean peaks. EVERYTHING stays on an exact integer
  * lattice by scaling by n: n·S_i = n·Σ_{j≤i}x_j − i·Σx — two integer
  * products of prefix sums, so the argmax comparison is exact integer
  * comparison, with no mean-as-double anywhere (the GroupedOls
  * sufficient-statistics policy).
  *
  * Autocorrelation: r_ℓ = Σ(x_t−x̄)(x_{t+ℓ}−x̄) / Σ(x_t−x̄)², the
  * standard large-n estimator with the full-series mean in both
  * factors and the lag-0 variance in the denominator. Multiplying
  * through by n² turns both sides into exact integers:
  *   n²·num_ℓ = n²·Σ_t x_t·x_{t+ℓ} − n·Σx·(Σ_head + Σ_tail)
  *              + (n−ℓ)·(Σx)²,
  *   n²·den   = n²·Σx² − n·(Σx)²·…  — see the code; the emitted
  * r_ℓ is one correctly-rounded division of those two integers,
  * snapped to a micro lattice. (With counts ≤ ~10⁶ and series length
  * ≤ ~10⁴ the integer terms stay below 2^63; callers with bigger
  * magnitudes should pre-scale, as documented for GroupedOls.)
  *
  * Scale shape: one window pass per series for prefix sums (the
  * series key partitions the window — no global window), then a
  * per-series aggregation; the lag join for autocorrelation is a
  * self-join on (series, t+ℓ) — shuffle keyed by the series, sized
  * by series length × lags, never by the corpus.
  */
object ChangePoint {

  /** Loud DECIMAL(38,0) overflow guard for exact centered-sum
    * kernels (the adfFromSums convention, ADVICE r15): true when
    * every sum is non-null and within 10¹⁹−1 (so any pairwise
    * product provably fits precision 38), otherwise raise_error —
    * under non-ANSI mode an overflowed product silently NULLs the
    * singularity filter and DROPS the series while the DuckDB
    * oracle's HUGEINT path errors, the exact cross-engine
    * divergence this guard makes loud. A null sum (upstream DECIMAL
    * overflow) is an overflow sighting too, caught before the
    * magnitude test.
    *
    * `eligible` is folded INTO the when() condition rather than left
    * as a sibling Filter conjunct: Catalyst is free to split and
    * reorder conjuncts of one Filter (CombineFilters +
    * PushDownPredicates), so a series a sibling predicate (e.g.
    * n >= 4) would drop could still evaluate the guard first and
    * abort the whole job. With eligibility inside the condition,
    * only otherwise-eligible series can ever raise, under any
    * conjunct ordering. (ADVICE r16.)
    */
  private def sumsWithinBound(
      op: String, label: Column, sums: Seq[Column],
      eligible: Column = lit(true)): Column = {
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val lim = lit(new java.math.BigDecimal("9999999999999999999")).cast(d)
    when(eligible && sums.map(c => c.isNull || abs(c) > lim).reduce(_ || _),
      raise_error(concat(
        lit(s"$op: centered sums exceed the exact "),
        lit("DECIMAL(38,0) product bound for series "),
        label.cast("string")))).isNull
  }

  /** Change-point per series: (seriesCol, change_idx, ns_dev, n)
    * where change_idx is the 1-based argmax of |n·S_i| (ties → the
    * EARLIEST index; i = n is excluded — S_n ≡ 0 carries no signal),
    * and ns_dev = n·S_{change_idx}, the n-scaled cumulative deviation
    * (sign tells the direction: negative = the series ran below its
    * mean up to the change). Input: one row per (series, idx, x) with
    * idx 1..n dense and x integral. Series with n < 2 are dropped.
    */
  def cusum(df: DataFrame, seriesCol: String, idxCol: String,
      xCol: String): DataFrame = {
    Reserved.check("cusum" -> df)
    val w = Window.partitionBy(col(seriesCol)).orderBy(col("__i"))
    val pre = df.select(col(seriesCol), col(idxCol).cast("long").as("__i"),
        col(xCol).cast("long").as("__x"))
      .withColumn("__ps", sum(col("__x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = pre.groupBy(col(seriesCol))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"))
    pre.join(tot, seriesCol)
      .filter(col("__n") >= 2 && col("__i") < col("__n"))
      .select(col(seriesCol),
        col("__i"), col("__n"),
        (col("__n") * col("__ps") - col("__i") * col("__sx")).as("__nsi"))
      .groupBy(col(seriesCol))
      .agg(max(struct(abs(col("__nsi")).as("a"), (-col("__i")).as("negI"),
          col("__nsi").as("v"), col("__n").as("n"))).as("best"))
      .select(col(seriesCol), (-col("best.negI")).as("change_idx"),
        col("best.v").as("ns_dev"), col("best.n").as("n"))
  }

  /** Autocorrelation r_ℓ for ℓ = 1..maxLag per series, micro-lattice:
    * (seriesCol, lag, r_micro, n). Input as in [[cusum]]; series
    * shorter than maxLag + 2 still emit the lags they support
    * (n − ℓ ≥ 1 pairs); zero-variance series are dropped (r is
    * undefined in any engine).
    */
  def autocorr(df: DataFrame, seriesCol: String, idxCol: String,
      xCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    Reserved.check("autocorr" -> df)
    val base = df.select(col(seriesCol), col(idxCol).cast("long").as("__i"),
      col(xCol).cast("long").as("__x"))
    val tot = base.groupBy(col(seriesCol))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"))
    // head rows fan out ×maxLag, then ONE equi-join on (series, i+ℓ)
    // — n·maxLag join rows, not the n² of a raw self-join filtered
    // down to the lag band
    val pairs = base
      .withColumn("__lag",
        explode(array((1 to maxLag).map(l => lit(l.toLong)): _*)))
      .select(col(seriesCol), (col("__i") + col("__lag")).as("__ti"),
        col("__lag"), col("__x").as("__xh"))
      .join(base.select(col(seriesCol), col("__i").as("__ti"),
          col("__x").as("__xt")),
        Seq(seriesCol, "__ti"))
    val perLag = pairs.groupBy(col(seriesCol), col("__lag"))
      .agg(sum(col("__xh") * col("__xt")).as("__sxy"),
        sum(col("__xh")).as("__sh"), sum(col("__xt")).as("__st"))
    perLag.join(tot, seriesCol)
      .filter(col("__n") * col("__sxx") =!= col("__sx") * col("__sx"))
      .select(col(seriesCol), col("__lag").as("lag"), col("__n").as("n"),
        round(
          ((col("__n") * col("__n") * col("__sxy")
            - col("__n") * col("__sx") * (col("__sh") + col("__st"))
            + (col("__n") - col("__lag")) * col("__sx") * col("__sx"))
            .cast("double") * lit(1e6)) /
          ((col("__n") * col("__n") * col("__sxx")
            - col("__n") * col("__sx") * col("__sx"))
            .cast("double"))).cast("long").as("r_micro"))
  }

  /** Ljung-Box portmanteau test (Ljung & Box 1978) per series: is
    * there ANY autocorrelation in lags 1..maxLag, as one statistic —
    * the whiteness check run on monitoring counters before trusting
    * an i.i.d.-assuming test ([[AbTest]], [[DistributionTests]]) on
    * them:
    *
    *   Q = n(n+2) Σ_{ℓ=1..h} r_ℓ² / (n−ℓ),   df = h
    *
    * r_ℓ rides [[autocorr]]'s exact n²-scaled lattice, but widened
    * to DECIMAL(38,0) (num_ℓ and den are exact for series far past
    * autocorr's documented long bound). Each lag's r_ℓ²/(n−ℓ) is ONE
    * written IEEE sequence snapped alone to the 9-dp lattice and
    * accumulated as DECIMAL(38,12) (the cramersV cell-sum policy;
    * ≤ maxLag rows per series). Q and the verdict edge are one
    * mirrored IEEE sequence at 6 dp against the caller's 4-dp χ²
    * critical value for df = h.
    *
    * Output: (seriesCol, n, h, q_stat, verdict). Series with
    * n ≤ maxLag + 1 or zero variance are dropped (Q undefined).
    * Shape: the [[autocorr]] lag join — shuffle keyed by series,
    * sized by series length × lags.
    */
  def ljungBox(df: DataFrame, seriesCol: String, idxCol: String,
      xCol: String, maxLag: Int, crit4: Long): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    require(crit4 > 0, s"crit4: $crit4")
    Reserved.check("ljungBox" -> df)
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(col(seriesCol), col(idxCol).cast("long").as("__i"),
      col(xCol).cast("long").as("__x"))
    val tot = base.groupBy(col(seriesCol))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__x").cast(d) * col("__x").cast(d)).as("__sxx"))
    val pairs = base
      .withColumn("__lag",
        explode(array((1 to maxLag).map(l => lit(l.toLong)): _*)))
      .select(col(seriesCol), (col("__i") + col("__lag")).as("__ti"),
        col("__lag"), col("__x").as("__xh"))
      .join(base.select(col(seriesCol), col("__i").as("__ti"),
          col("__x").as("__xt")),
        Seq(seriesCol, "__ti"))
    val perLag = pairs.groupBy(col(seriesCol), col("__lag"))
      .agg(sum(col("__xh").cast(d) * col("__xt").cast(d)).as("__sxy"),
        sum(col("__xh")).as("__sh"), sum(col("__xt")).as("__st"))
    val num = col("__n").cast(d) * col("__n").cast(d) * col("__sxy") -
      col("__n").cast(d) * col("__sx").cast(d) *
        (col("__sh") + col("__st")).cast(d) +
      (col("__n") - col("__lag")).cast(d) *
        col("__sx").cast(d) * col("__sx").cast(d)
    val den = col("__n").cast(d) * col("__n").cast(d) * col("__sxx") -
      col("__n").cast(d) * col("__sx").cast(d) * col("__sx").cast(d)
    perLag.join(tot, seriesCol)
      .filter(col("__n") > maxLag + 1 &&
        col("__n").cast(d) * col("__sxx") =!=
          col("__sx").cast(d) * col("__sx").cast(d))
      .select(col(seriesCol), col("__n"),
        round(
          (num.cast("double") / den.cast("double")) *
            (num.cast("double") / den.cast("double")) /
            (col("__n") - col("__lag")).cast("double"), 9)
          .cast(org.apache.spark.sql.types.DecimalType(38, 12))
          .as("__term"))
      .groupBy(col(seriesCol), col("__n"))
      .agg(sum(col("__term")).as("__terms"))
      .select(col(seriesCol), col("__n").as("n"),
        lit(maxLag.toLong).as("h"),
        round(col("__n").cast("double") *
          (col("__n") + 2).cast("double") *
          col("__terms").cast("double"), 6).as("q_stat"),
        when(round(col("__n").cast("double") *
          (col("__n") + 2).cast("double") *
          col("__terms").cast("double"), 6) >
          lit(crit4).cast("double") / lit(10000.0),
          "autocorrelated").otherwise("white").as("verdict"))
  }

  /** Partial autocorrelation at lags 1..3 per series — ACF's
    * identification partner: r_ℓ ([[autocorr]]) says whether lag ℓ
    * correlates AT ALL; φ_ℓℓ says whether it adds anything AFTER the
    * shorter lags are accounted for (the AR-order cutoff signal a
    * forecasting layer reads before fitting [[TimeSeries]] models).
    * Closed-form Durbin-Levinson for the first three steps:
    *
    *   φ₁₁ = r₁
    *   φ₂₂ = (r₂ − r₁²)/(1 − r₁²),   φ₂₁ = r₁ − φ₂₂·r₁
    *   φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁)/(1 − φ₂₁r₁ − φ₂₂r₂)
    *
    * r_ℓ rides the [[ljungBox]] DECIMAL-widened exact lattice
    * (num_ℓ/den); each φ is ONE written IEEE sequence over the three
    * r divisions, mirrored verbatim in the oracle, micro-snapped at
    * the edge. Guards are exact where the lattice allows: series
    * with zero variance or |r₁| = 1 (den² = num₁²) drop whole; a
    * lag-3 row additionally drops when its own IEEE denominator is
    * exactly 0. Series need n > 4 so every lag has ≥ 2 pairs.
    *
    * Output: (seriesCol, lag, n, phi_micro) — lag 1 equals
    * [[autocorr]]'s r₁ by construction. Shape: the [[autocorr]] lag
    * join plus a 3-column pivot per series.
    */
  def pacf(df: DataFrame, seriesCol: String, idxCol: String,
      xCol: String): DataFrame = {
    Reserved.check("pacf" -> df)
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(col(seriesCol), col(idxCol).cast("long").as("__i"),
      col(xCol).cast("long").as("__x"))
    val tot = base.groupBy(col(seriesCol))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__x").cast(d) * col("__x").cast(d)).as("__sxx"))
    val pairs = base
      .withColumn("__lag",
        explode(array((1 to 3).map(l => lit(l.toLong)): _*)))
      .select(col(seriesCol), (col("__i") + col("__lag")).as("__ti"),
        col("__lag"), col("__x").as("__xh"))
      .join(base.select(col(seriesCol), col("__i").as("__ti"),
          col("__x").as("__xt")),
        Seq(seriesCol, "__ti"))
    val perLag = pairs.groupBy(col(seriesCol), col("__lag"))
      .agg(sum(col("__xh").cast(d) * col("__xt").cast(d)).as("__sxy"),
        sum(col("__xh")).as("__sh"), sum(col("__xt")).as("__st"))
    val num = col("__n").cast(d) * col("__n").cast(d) * col("__sxy") -
      col("__n").cast(d) * col("__sx").cast(d) *
        (col("__sh") + col("__st")).cast(d) +
      (col("__n") - col("__lag")).cast(d) *
        col("__sx").cast(d) * col("__sx").cast(d)
    val den = col("__n").cast(d) * col("__n").cast(d) * col("__sxx") -
      col("__n").cast(d) * col("__sx").cast(d) * col("__sx").cast(d)
    val piv = perLag.join(tot, seriesCol)
      .filter(col("__n") > 4 &&
        col("__n").cast(d) * col("__sxx") =!=
          col("__sx").cast(d) * col("__sx").cast(d))
      .select(col(seriesCol), col("__n"), col("__lag"),
        num.as("__num"), den.as("__den"))
      .groupBy(col(seriesCol), col("__n"), col("__den"))
      .agg(max(when(col("__lag") === 1L, col("__num"))).as("__n1"),
        max(when(col("__lag") === 2L, col("__num"))).as("__n2"),
        max(when(col("__lag") === 3L, col("__num"))).as("__n3"))
      // n > 4 guarantees every lag 1..3 has pairs, so a NULL num/den
      // here can only be DECIMAL(38,0) overflow — and the den²/num²
      // squares below double the exponent, so bound-check first and
      // raise loudly instead of the =!= silently dropping the series
      .filter(sumsWithinBound("pacf", col(seriesCol),
        Seq(col("__den"), col("__n1"), col("__n2"), col("__n3"))))
      // |r₁| = 1 makes the step-2 denominator exactly 0 — exact
      // integer guard on the lattice, not an IEEE compare
      .filter(col("__den") * col("__den") =!= col("__n1") * col("__n1"))
    val stepped = piv
      .withColumn("__r1", col("__n1").cast("double") /
        col("__den").cast("double"))
      .withColumn("__r2", col("__n2").cast("double") /
        col("__den").cast("double"))
      .withColumn("__r3", col("__n3").cast("double") /
        col("__den").cast("double"))
      .withColumn("__p22",
        (col("__r2") - col("__r1") * col("__r1")) /
          (lit(1.0) - col("__r1") * col("__r1")))
      .withColumn("__p21", col("__r1") - col("__p22") * col("__r1"))
      .withColumn("__d3",
        lit(1.0) - col("__p21") * col("__r1") - col("__p22") * col("__r2"))
    stepped
      .select(col(seriesCol), col("__n").as("n"),
        explode(array(
          struct(lit(1L).as("lag"), col("__r1").as("phi"),
            lit(true).as("keep")),
          struct(lit(2L).as("lag"), col("__p22").as("phi"),
            lit(true).as("keep")),
          struct(lit(3L).as("lag"),
            ((col("__r3") - col("__p21") * col("__r2") -
              col("__p22") * col("__r1")) / col("__d3")).as("phi"),
            (col("__d3") =!= lit(0.0)).as("keep")))).as("__s"))
      .filter(col("__s.keep"))
      .select(col(seriesCol), col("__s.lag").as("lag"), col("n"),
        round(col("__s.phi") * lit(1e6)).cast("long").as("phi_micro"))
  }

  /** Dickey-Fuller unit-root test per series (Dickey & Fuller 1979;
    * the non-augmented, constant-included form) — "is this monitor
    * counter MEAN-REVERTING, or a random walk?": a drift test
    * ([[graft.operators.NonParametric.mannKendall]]) on a random
    * walk fires constantly on noise; checking for a unit root first
    * tells the dashboard which alarms are even meaningful. Regress
    * Δx_t on x_{t−1} with intercept and read the slope's t-ratio:
    *
    *   t = (S_uv/S_uu) / √((S_vv − S_uv²/S_uu) / ((n−2)·S_uu))
    *
    * with u = x_{t−1}, v = Δx_t, S_ab the n-scaled centered sums
    * (nΣab − ΣaΣb) — exact DECIMAL(38,0) integers down to ONE
    * written IEEE sequence at the micro edge (the [[GroupedOls]]
    * sufficient-statistics policy). The verdict compares the
    * SNAPPED t_micro against the Fuller (1976) 5% critical value
    * for the constant-included form, −2.86: below → "stationary",
    * else "unit_root" (the DF distribution is nonstandard, so the
    * constant is pinned, not derived).
    *
    * Output: (seriesCol, n, beta_micro, t_micro, verdict) with n =
    * the PAIR count (series length − 1). Series with fewer than 4
    * pairs, zero regressor variance (S_uu = 0), or a PERFECT fit
    * (S_vv·S_uu = S_uv² — zero residual variance leaves t undefined;
    * both are exact integer checks) drop. Shape: one ordered window
    * per series for the lag pair, one aggregation — no self-join.
    */
  def dickeyFuller(df: DataFrame, seriesCol: String, idxCol: String,
      xCol: String): DataFrame = {
    Reserved.check("dickeyFuller" -> df)
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(seriesCol)).orderBy(col("__i"))
    val pairs = df.select(col(seriesCol), col(idxCol).cast("long").as("__i"),
        col(xCol).cast("long").as("__x"))
      .withColumn("__u", lag(col("__x"), 1).over(w))
      .filter(col("__u").isNotNull)
      .select(col(seriesCol), col("__u"),
        (col("__x") - col("__u")).as("__v"))
    dickeyFullerFromSums(
      pairs.groupBy(col(seriesCol))
        .agg(count(lit(1)).as("n"),
          sum(col("__u")).as("__su"), sum(col("__v")).as("__sv"),
          sum(col("__u").cast(d) * col("__u").cast(d)).as("__suu"),
          sum(col("__u").cast(d) * col("__v").cast(d)).as("__suv"),
          sum(col("__v").cast(d) * col("__v").cast(d)).as("__svv")),
      seriesCol)
  }

  /** [[dickeyFuller]]'s combine over already-aggregated per-series
    * lag-pair sums `(seriesCol, n, __su, __sv, __suu, __suv, __svv)`
    * — the six exact sums are the regression's complete sufficient
    * statistics, so the streaming twin re-derives them from its
    * day-rollup state each trigger and replays THIS code, sharing
    * the batch oracle (both refusals included).
    */
  def dickeyFullerFromSums(
      agg: DataFrame, seriesCol: String): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val suu = col("n").cast(d) * col("__suu") -
      col("__su").cast(d) * col("__su").cast(d)
    val suv = col("n").cast(d) * col("__suv") -
      col("__su").cast(d) * col("__sv").cast(d)
    val svv = col("n").cast(d) * col("__svv") -
      col("__sv").cast(d) * col("__sv").cast(d)
    val t = (suv.cast("double") / suu.cast("double")) /
      sqrt((svv.cast("double") -
        suv.cast("double") * suv.cast("double") / suu.cast("double")) /
        ((col("n").cast("double") - lit(2.0)) * suu.cast("double")))
    val tMicro = round(t * lit(1e6)).cast("long")
    agg
      .filter(sumsWithinBound("dickeyFullerFromSums", col(seriesCol),
          Seq(suu, suv, svv), eligible = col("n") >= 4) &&
        col("n") >= 4 && suu > lit(0L).cast(d) &&
        svv * suu > suv * suv)
      .select(col(seriesCol), col("n"),
        round(suv.cast("double") / suu.cast("double") * lit(1e6))
          .cast("long").as("beta_micro"),
        tMicro.as("t_micro"),
        when(tMicro < lit(-2860000L), "stationary")
          .otherwise("unit_root").as("verdict"))
  }

  /** Lag-1 Granger causality between every ordered pair of series
    * (Granger 1969) — "does yesterday's CLICK volume help predict
    * today's PURCHASE volume beyond purchases' own history?": the
    * cross-series lead-lag screen a monitoring layer runs to wire
    * alert dependencies. For effect y and candidate cause x, compare
    *
    *   restricted:   y_t = a + b·y_{t−1}
    *   unrestricted: y_t = a + b·y_{t−1} + c·x_{t−1}
    *
    *   F = (RSS_r − RSS_u) / (RSS_u / (n−3))   ~ F(1, n−3)
    *
    * Exactness: per-pair sufficient sums are exact DECIMAL(38,0)
    * integers; the n-scaled centered forms (S_pp, S_qq, S_pq, S_yp,
    * S_yq, S_yy) stay exact; the two-regressor solve (Cramer's
    * rule), both RSS, and F are ONE written IEEE sequence at the
    * micro edge. No verdict column: the F(1, n−3) critical value
    * depends on n, so the statistic is reported raw (the q_cvm_test
    * convention) — join f_micro against the caller's F table.
    *
    * Guards (drop the pair): n < 5 pairs; singular design
    * (S_pp·S_qq = S_pq², exact DECIMAL); zero restricted-model
    * residual or zero unrestricted RSS (IEEE > 0 checks — F
    * undefined/infinite). Output: one row per ORDERED (cause,
    * effect) pair with cause ≠ effect — (cause, effect, n, f_micro).
    *
    * `idxCol` is a SHARED integer time index (e.g. the epoch-day
    * number) — the SAME t across every series, with "lag 1" meaning
    * idx − 1. A time t contributes to a (cause, effect) pair only
    * when y_t, y_{t−1} (consecutive idx in the effect series) AND
    * x_{t−1} all exist — the textbook listwise drop. A per-series
    * ROW_NUMBER index is NOT a valid idxCol: one series missing a
    * calendar day present in another shifts every subsequent index
    * and the lag pairs silently compare different dates.
    *
    * Shape: one self-join of the (series, t) table on the lag index
    * — series² × length rows, sized by the series COUNT, never the
    * corpus — then one aggregation per pair.
    */
  def grangerLag1(df: DataFrame, seriesCol: String, idxCol: String,
      xCol: String): DataFrame = {
    Reserved.check("granger" -> df)
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col("__s")).orderBy(col("__i"))
    val base0 = df.select(col(seriesCol).as("__s"),
      col(idxCol).cast("long").as("__i"),
      col(xCol).cast("long").as("__x"))
    // effect side carries (y_t, y_{t-1}) with the CONSECUTIVE-index
    // check (a gap day breaks the pair instead of silently pairing
    // y_t with the value two days back)
    val eff = base0
      .withColumn("__lag", lag(col("__x"), 1).over(w))
      .withColumn("__lagi", lag(col("__i"), 1).over(w))
      .filter(col("__lagi") === col("__i") - 1)
    // cause side is x at idx − 1 directly (shifted +1 for the join):
    // needs only x_{t−1} to exist, never x_t
    val pairs = eff
      .select(col("__s").as("effect"), col("__i"),
        col("__x").as("__y"), col("__lag").as("__p"))
      .join(base0.select(col("__s").as("cause"),
          (col("__i") + 1).as("__i"), col("__x").as("__q")),
        Seq("__i"))
      .filter(col("cause") =!= col("effect"))
    val agg = pairs.groupBy(col("cause"), col("effect"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("__sy"), sum(col("__p")).as("__sp"),
        sum(col("__q")).as("__sq"),
        sum(col("__y").cast(d) * col("__p").cast(d)).as("__syp"),
        sum(col("__y").cast(d) * col("__q").cast(d)).as("__syq"),
        sum(col("__p").cast(d) * col("__q").cast(d)).as("__spq"),
        sum(col("__p").cast(d) * col("__p").cast(d)).as("__spp"),
        sum(col("__q").cast(d) * col("__q").cast(d)).as("__sqq"),
        sum(col("__y").cast(d) * col("__y").cast(d)).as("__syy"))
    def ctr(ab: Column, a: Column, b: Column) =
      col("n").cast(d) * ab - a.cast(d) * b.cast(d)
    val spp = ctr(col("__spp"), col("__sp"), col("__sp"))
    val sqq = ctr(col("__sqq"), col("__sq"), col("__sq"))
    val spq = ctr(col("__spq"), col("__sp"), col("__sq"))
    val syp = ctr(col("__syp"), col("__sy"), col("__sp"))
    val syq = ctr(col("__syq"), col("__sy"), col("__sq"))
    val syy = ctr(col("__syy"), col("__sy"), col("__sy"))
    val det = spp.cast("double") * sqq.cast("double") -
      spq.cast("double") * spq.cast("double")
    val b = (syp.cast("double") * sqq.cast("double") -
      syq.cast("double") * spq.cast("double")) / det
    val c = (syq.cast("double") * spp.cast("double") -
      syp.cast("double") * spq.cast("double")) / det
    val rssR = syy.cast("double") -
      syp.cast("double") * syp.cast("double") / spp.cast("double")
    val rssU = syy.cast("double") - b * syp.cast("double") -
      c * syq.cast("double")
    val f = (rssR - rssU) / (rssU / (col("n").cast("double") - lit(3.0)))
    agg
      .filter(sumsWithinBound("grangerLag1",
          concat(col("cause"), lit("->"), col("effect")),
          Seq(spp, sqq, spq, syp, syq, syy),
          eligible = col("n") >= 5) &&
        col("n") >= 5 &&
        spp > lit(0L).cast(d) &&
        spp * sqq =!= spq * spq)
      .withColumn("__rssu", rssU)
      .filter(col("__rssu") > 0.0)
      .select(col("cause"), col("effect"), col("n"),
        round(f * lit(1e6)).cast("long").as("f_micro"))
  }

  /** Augmented Dickey-Fuller with ONE lagged difference (ADF(1),
    * Said & Dickey 1984) per series — [[dickeyFuller]]'s regression
    * plus the Δx_{t−1} augmentation that absorbs AR(2) serial
    * correlation in the differences (plain DF over-rejects there):
    *
    *   Δx_t = α + β·x_{t−1} + γ·Δx_{t−1},   read β's t-ratio
    *
    * The solve is the [[grangerLag1]] two-regressor Cramer kernel
    * (v = Δx_t, p = x_{t−1}, q = Δx_{t−1}): exact DECIMAL(38,0)
    * n-scaled centered sums S_ab = nΣab − ΣaΣb, then ONE written
    * IEEE sequence for det = S_pp·S_qq − S_pq², β, γ, the residual
    * sum RSS = S_vv − β·S_vp − γ·S_vq, and
    *
    *   t = β / √(RSS·S_qq / ((n−3)·det))
    *
    * — the Ŝ-scaled form of s²·[(X′X)⁻¹]_ββ (every n factor
    * cancels; AdfSpec cross-checks against a brute-force
    * normal-equations solve). Verdict at the same pinned Fuller
    * (1976) 5% constant-form critical value −2.86 as
    * [[dickeyFuller]] — under the null the ADF τ statistic follows
    * the same DF distribution.
    *
    * Output: (seriesCol, n, beta_micro, t_micro, verdict) with n =
    * the TRIPLE count (series length − 2). Guards (drop the
    * series): n < 5; zero level variance (S_pp = 0); singular
    * design (S_pp·S_qq = S_pq², exact DECIMAL); zero residual (IEEE
    * > 0 check). Shape: one ordered window per series for the two
    * lags, one aggregation — no self-join; sufficient statistics
    * only, so a streaming twin can replay this combine from
    * day-rollup state.
    */
  def adfLag1(df: DataFrame, seriesCol: String, idxCol: String,
      xCol: String): DataFrame = {
    Reserved.check("adfLag1" -> df)
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(seriesCol)).orderBy(col("__i"))
    val triples = df
      .select(col(seriesCol), col(idxCol).cast("long").as("__i"),
        col(xCol).cast("long").as("__x"))
      .withColumn("__x1", lag(col("__x"), 1).over(w))
      .withColumn("__x2", lag(col("__x"), 2).over(w))
      .filter(col("__x2").isNotNull)
      .select(col(seriesCol), (col("__x") - col("__x1")).as("__v"),
        col("__x1").as("__p"), (col("__x1") - col("__x2")).as("__q"))
    adfFromSums(
      triples.groupBy(col(seriesCol))
        .agg(count(lit(1)).as("n"),
          sum(col("__v")).as("__sv"), sum(col("__p")).as("__sp"),
          sum(col("__q")).as("__sq"),
          sum(col("__v").cast(d) * col("__p").cast(d)).as("__svp"),
          sum(col("__v").cast(d) * col("__q").cast(d)).as("__svq"),
          sum(col("__p").cast(d) * col("__q").cast(d)).as("__spq"),
          sum(col("__p").cast(d) * col("__p").cast(d)).as("__spp"),
          sum(col("__q").cast(d) * col("__q").cast(d)).as("__sqq"),
          sum(col("__v").cast(d) * col("__v").cast(d)).as("__svv")),
      seriesCol)
  }

  /** [[adfLag1]]'s combine over already-aggregated per-series triple
    * sums `(seriesCol, n, __sv, __sp, __sq, __svp, __svq, __spq,
    * __spp, __sqq, __svv)` — the ten exact sums are the regression's
    * complete sufficient statistics, so a streaming twin re-derives
    * them from its day-rollup state each trigger and replays THIS
    * code, sharing the batch oracle (all refusals included).
    */
  def adfFromSums(agg0: DataFrame, seriesCol: String): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val agg = agg0.select(col(seriesCol), col("n"),
      col("__sv"), col("__sp"), col("__sq"),
      col("__svp").cast(d).as("__svp"), col("__svq").cast(d).as("__svq"),
      col("__spq").cast(d).as("__spq"), col("__spp").cast(d).as("__spp"),
      col("__sqq").cast(d).as("__sqq"), col("__svv").cast(d).as("__svv"))
    def ctr(ab: Column, a: Column, b: Column) =
      col("n").cast(d) * ab - a.cast(d) * b.cast(d)
    val spp = ctr(col("__spp"), col("__sp"), col("__sp"))
    val sqq = ctr(col("__sqq"), col("__sq"), col("__sq"))
    val spq = ctr(col("__spq"), col("__sp"), col("__sq"))
    val svp = ctr(col("__svp"), col("__sv"), col("__sp"))
    val svq = ctr(col("__svq"), col("__sv"), col("__sq"))
    val svv = ctr(col("__svv"), col("__sv"), col("__sv"))
    val det = spp.cast("double") * sqq.cast("double") -
      spq.cast("double") * spq.cast("double")
    val b = (svp.cast("double") * sqq.cast("double") -
      svq.cast("double") * spq.cast("double")) / det
    val c = (svq.cast("double") * spp.cast("double") -
      svp.cast("double") * spq.cast("double")) / det
    val rssU = svv.cast("double") - b * svp.cast("double") -
      c * svq.cast("double")
    val t = b / sqrt(rssU * sqq.cast("double") /
      ((col("n").cast("double") - lit(3.0)) * det))
    val tMicro = round(t * lit(1e6)).cast("long")
    // Overflow must be LOUD (ADVICE r15): the singularity filter
    // multiplies exact DECIMAL(38,0) centered sums, and past
    // precision 38 the product nulls out under non-ANSI mode — so
    // `null =!= x` would silently DROP the series while the DuckDB
    // oracle's HUGEINT path errors. Every one of the SIX centered
    // sums is checked (svp/svq/svv feed rssU, whose null would
    // silently fail the `> 0.0` filter the same way), and a sum that
    // is itself NULL — the n·Σab product already past precision 38,
    // or an upstream DECIMAL sum overflow — is an overflow sighting
    // too, caught by the isNull arm BEFORE the magnitude test (whose
    // null would otherwise fall through the `when`). Bound: 10^19−1
    // per sum, so any pairwise product provably fits precision 38. A
    // series long/large enough to trip any arm needs a rescaled
    // lattice, not a silent row drop.
    val lim = lit(new java.math.BigDecimal("9999999999999999999")).cast(d)
    val ovf =
      when(Seq(spp, sqq, spq, svp, svq, svv)
          .map(c => c.isNull || abs(c) > lim).reduce(_ || _),
        raise_error(concat(
          lit("adfFromSums: centered sums exceed the exact "),
          lit("DECIMAL(38,0) product bound for series "),
          col(seriesCol).cast("string")))).isNull
    agg
      .filter(ovf && col("n") >= 5 && spp > lit(0L).cast(d) &&
        spp * sqq =!= spq * spq)
      .withColumn("__rssu", rssU)
      .filter(col("__rssu") > 0.0)
      .select(col(seriesCol), col("n"),
        round(b * lit(1e6)).cast("long").as("beta_micro"),
        tMicro.as("t_micro"),
        when(tMicro < lit(-2860000L), "stationary")
          .otherwise("unit_root").as("verdict"))
  }

  /** Durbin-Watson statistic per series on the residuals from the
    * per-series MEAN (equivalently the von Neumann ratio, since
    * first-differencing cancels the mean exactly):
    *
    *   d = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t²
    *     = n·Σ(x_t − x_{t−1})² / (n·Σx² − (Σx)²)
    *
    * — a fully exact rational: the numerator's mean cancellation
    * makes BOTH sides integer (DECIMAL(38,0)), so d is one division
    * at the 6-dp edge and the conventional verdict bands are exact
    * integer cross-multiplications (d < 1 ⇔ num < den → "positive"
    * serial correlation; d > 3 ⇔ num > 3·den → "negative"; else
    * "none"; d ≈ 2 is white).
    *
    * Output: (seriesCol, n, dw, verdict). Series with n < 2 or zero
    * variance are dropped. Shape: one ordered window per series for
    * the lag diff, one aggregation — no self-join.
    */
  def durbinWatson(df: DataFrame, seriesCol: String, idxCol: String,
      xCol: String): DataFrame = {
    Reserved.check("durbinWatson" -> df)
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(seriesCol)).orderBy(col("__i"))
    val pre = df.select(col(seriesCol), col(idxCol).cast("long").as("__i"),
        col(xCol).cast("long").as("__x"))
      .withColumn("__d", col("__x") - lag(col("__x"), 1).over(w))
    val agg = pre.groupBy(col(seriesCol))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__x").cast(d) * col("__x").cast(d)).as("__sxx"),
        sum(col("__d").cast(d) * col("__d").cast(d)).as("__sdd"))
    val num = col("__n").cast(d) * col("__sdd")
    val den = col("__n").cast(d) * col("__sxx") -
      col("__sx").cast(d) * col("__sx").cast(d)
    agg
      .filter(col("__n") >= 2 &&
        col("__n").cast(d) * col("__sxx") =!=
          col("__sx").cast(d) * col("__sx").cast(d))
      .select(col(seriesCol), col("__n").as("n"),
        round(num.cast("double") / den.cast("double"), 6).as("dw"),
        when(num < den, "positive")
          .when(num > den * lit(3L).cast(d), "negative")
          .otherwise("none").as("verdict"))
  }
}
