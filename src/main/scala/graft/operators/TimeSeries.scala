package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key time-series smoothing. EWMA is a RECURSIVE fold
  * (yᵢ = (yᵢ₋₁ + xᵢ)·α) — not expressible as any built-in window
  * aggregate, which is exactly why it earns an operator: the engine's
  * answer to "analytics that need an ordered carry".
  *
  * α is FIXED at 1/2: `(a + x) · 0.5` is an exact halving, so the
  * fold is a deterministic chain of IEEE add/halve with no `pow`
  * (whose libm-vs-JVM bits the oracle discipline avoids — the Bm25
  * log-base reasoning). The same left fold replays bit-for-bit as a
  * DuckDB `list_reduce` over `list(value ORDER BY ...)`.
  *
  * Scale shape: one shuffle on the key; each group's history is
  * collected into ONE array on the reducer — bounded by the per-key
  * row count, which for telemetry/user streams is the natural state
  * bound (the events table: ≤ ~100 rows/user at any SF). For
  * unbounded keys, run the same recurrence as streaming state
  * (y rides a `mapGroupsWithState` value) instead of a batch
  * collect — the fold is associative-free either way, so there is
  * no partial-aggregate formulation to prefer.
  */
object TimeSeries {

  /** (keyCols..., n, ewma): the α=0.5 exponential moving average of
    * `valueCol` over each key's rows in `(orderCols)` order —
    * y₁ = x₁, yᵢ = (yᵢ₋₁ + xᵢ)·0.5 — rounded to 6 dp at the edge.
    * `orderCols` must totally order each key's rows (pass a unique
    * tiebreaker; an ambiguous order has no well-defined EWMA in any
    * engine).
    */
  def ewmaHalf(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "keys/order required")
    Reserved.check("ewmaHalf" -> df)

    val sortStruct = struct(
      (orderCols.map(col) :+ col(valueCol).as("__v")): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(sortStruct)).as("__hist"))
      .select((keyCols.map(col) :+ col("n") :+
        round(expr(
          "aggregate(slice(__hist, 2, size(__hist) - 1), " +
            "__hist[0].__v, (a, x) -> (a + x.__v) * 0.5D)"), 6)
          .as("ewma")): _*)
  }

  /** (keyCols..., n, level, trend, forecast): Holt's linear
    * (double-exponential) smoothing with α = β = 1/2 — the one-step
    * trend-aware forecast EWMA cannot give. Recurrence per key in
    * `(orderCols)` order, initialized l₁ = x₁, b₁ = 0:
    *
    *   l' = 0.5·x + 0.5·(l + b)
    *   b' = 0.5·(l' − l) + 0.5·b
    *
    * Every step is IEEE adds and exact halvings applied in ONE defined
    * order, so any engine replaying the same fold (DuckDB:
    * `list_transform` to (l,b) structs then `list_reduce`) produces
    * bit-identical doubles; 6-dp rounding at the edge only. Same scale
    * shape and caveats as [[ewmaHalf]] — one key shuffle, per-key
    * history bounded, streaming state for unbounded keys.
    */
  def holtHalf(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "keys/order required")
    Reserved.check("holtHalf" -> df)
    val sortStruct = struct(
      (orderCols.map(col) :+ col(valueCol).as("__v")): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(sortStruct)).as("__hist"))
      .withColumn("__fit", expr(
        "aggregate(slice(__hist, 2, size(__hist) - 1), " +
          "named_struct('l', __hist[0].__v, 'b', 0.0D), " +
          "(a, x) -> named_struct(" +
          "'l', 0.5D * x.__v + 0.5D * (a.l + a.b), " +
          "'b', 0.5D * ((0.5D * x.__v + 0.5D * (a.l + a.b)) - a.l) " +
          "+ 0.5D * a.b))"))
      .select((keyCols.map(col) :+ col("n") :+
        round(col("__fit.l"), 6).as("level") :+
        round(col("__fit.b"), 6).as("trend") :+
        round(col("__fit.l") + col("__fit.b"), 6).as("forecast")): _*)
  }

  /** (keyCols..., n, level, trend, s0..s3, forecast): additive
    * Holt-Winters with period 4 and α = β = γ = 1/2 — [[holtHalf]]
    * plus a seasonal component, the triple-exponential smoother for
    * series with a short repeating cycle (Winters 1960). Recurrence
    * per key in `(orderCols)` order, obs t using seasonal slot
    * (t−1) mod 4, initialized l₁ = x₁, b₁ = 0, s ≡ 0:
    *
    *   l' = 0.5·(x − s_slot) + 0.5·(l + b)
    *   b' = 0.5·(l' − l) + 0.5·b
    *   s_slot' = 0.5·(x − l') + 0.5·s_slot
    *
    * The zero-init seasonal state means early observations load the
    * trend before the slots differentiate — the standard trade-off
    * for an init that needs no first-cycle averaging pass (and the
    * one that keeps the fold a pure per-row recurrence). All steps
    * are IEEE adds and exact halvings in ONE defined order (the
    * [[holtHalf]] discipline — a recursive CTE replays them
    * bit-for-bit); forecast = l + b + s_{n mod 4}; 6-dp edge.
    */
  def holtWintersHalf(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "keys/order required")
    Reserved.check("holtWintersHalf" -> df)
    val sortStruct = struct(
      (orderCols.map(col) :+ col(valueCol).as("__v")): _*)
    val lNew = "0.5D * (x.__v - element_at(a.s, (a.i % 4) + 1)) " +
      "+ 0.5D * (a.l + a.b)"
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(sortStruct)).as("__hist"))
      .withColumn("__fit", expr(
        "aggregate(slice(__hist, 2, size(__hist) - 1), " +
          "named_struct('l', __hist[0].__v, 'b', 0.0D, " +
          "'s', array(0.0D, 0.0D, 0.0D, 0.0D), 'i', 1), " +
          s"(a, x) -> named_struct(" +
          s"'l', $lNew, " +
          s"'b', 0.5D * (($lNew) - a.l) + 0.5D * a.b, " +
          s"'s', transform(a.s, (sv, j) -> IF(j = a.i % 4, " +
          s"0.5D * (x.__v - ($lNew)) + 0.5D * sv, sv)), " +
          "'i', a.i + 1))"))
      .select((keyCols.map(col) :+ col("n") :+
        round(col("__fit.l"), 6).as("level") :+
        round(col("__fit.b"), 6).as("trend") :+
        round(element_at(col("__fit.s"), 1), 6).as("s0") :+
        round(element_at(col("__fit.s"), 2), 6).as("s1") :+
        round(element_at(col("__fit.s"), 3), 6).as("s2") :+
        round(element_at(col("__fit.s"), 4), 6).as("s3") :+
        round(col("__fit.l") + col("__fit.b") +
          element_at(col("__fit.s"), pmod(col("n"), lit(4)).cast("int") + 1),
          6).as("forecast")): _*)
  }

  /** Per-key windowed count-anomaly detection: flag hourly buckets
    * whose count sits more than `z` standard deviations from the
    * key's own mean — the ingestion-monitoring alarm ("this source's
    * volume spiked/dropped") a pipeline runs per feed.
    *
    * The z-test is evaluated WITHOUT sqrt or any float: with H
    * buckets, total S and sum of squares SS for a key,
    *   |c − μ| > z·σ  ⟺  (c·H − S)² > z²·(H·SS − S²)
    * — pure integer arithmetic, so the flag set is bit-identical in
    * any engine and under any partitioning. (Long overflow bound:
    * c·H < 2^31 keeps the square exact — per-key hourly counts up to
    * ~2e9·hours⁻¹; beyond that move the comparison onto DECIMAL.)
    *
    * Scale: one map-side-combined (key, hour) count, one key-level
    * re-aggregation (bucket-count-sized), one broadcastable join
    * back. No windows at all.
    */
  /** Additive hour-of-day seasonal profile per key — the
    * decomposition that explains WHICH hours run hot before an
    * anomaly test ([[anomalousCounts]]) asks whether one bucket
    * broke the pattern. Per (key, hour-of-day): row count, mean
    * value in integer micro-units (floor division on the caller's
    * integral value lattice — pass cents/micros, not raw doubles),
    * and the seasonal delta vs the key's own overall mean
    * (mean_micro − overall_micro, an exact integer difference of two
    * floor-divided means).
    *
    * `valueCol` must be non-negative: Spark's `div` truncates toward
    * zero while DuckDB's `//` floors, so negative lattices would
    * diverge by one (the q_k_anonymity FLOOR lesson).
    *
    * Scale: one map-side-combined (key, hour) aggregation — 24
    * cells per key — then a key-level rollup of those cells
    * (broadcast back). The corpus is touched once; no windows.
    */
  def seasonalProfile(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String)
      : DataFrame = {
    val cells = df
      .select(col(keyCol), hour(col(tsCol)).as("hour_of_day"),
        col(valueCol).cast("long").as("__v"))
      .groupBy(col(keyCol), col("hour_of_day"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__s"))
    val overall = cells.groupBy(col(keyCol))
      .agg(sum(col("n")).as("__tn"), sum(col("__s")).as("__ts"))
    cells.join(broadcast(overall), keyCol)
      .select(col(keyCol), col("hour_of_day"), col("n"),
        expr("(__s * CAST(1000000 AS BIGINT)) div n").as("mean_micro"),
        (expr("(__s * CAST(1000000 AS BIGINT)) div n") -
          expr("(__ts * CAST(1000000 AS BIGINT)) div __tn"))
          .as("seasonal_micro"))
  }

  def anomalousCounts(
      df: DataFrame, keyCol: String, tsCol: String, z: Int = 2)
      : DataFrame = {
    require(z > 0, s"z: $z")
    val counts = df
      .groupBy(col(keyCol), window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol),
        unix_timestamp(col("window.start")).as("hour_start"), col("n"))
    val stats = counts.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__h"), sum(col("n")).as("__s"),
        sum(col("n") * col("n")).as("__ss"))
    val dev = col("n") * col("__h") - col("__s")
    counts.join(broadcast(stats), keyCol)
      .filter(dev * dev >
        lit(z.toLong * z) * (col("__h") * col("__ss") - col("__s") * col("__s")))
      .select(col(keyCol), col("hour_start"), col("n"),
        when(dev > 0, "high").otherwise("low").as("side"))
  }

  /** SAX — Symbolic Aggregate approXimation (Lin, Keogh, Lonardi &
    * Chiu 2003) of each key's hourly activity series: the series is
    * piecewise-aggregated into `segments` equal-count chunks (PAA)
    * and each chunk is mapped to a letter, so a 10⁶-point series
    * becomes a `segments`-char word on which motif mining, indexing,
    * and anomaly lookup are string problems. Two SAX conventions are
    * replaced by deterministic integer-lattice equivalents:
    *
    *  - PAA keeps the chunk SUM (exact BIGINT), not a float mean —
    *    equal-count chunks make sum and mean rank identically within
    *    a key, which is all the letter assignment reads;
    *  - breakpoints are per-key equal-frequency (`ntile` over the
    *    key's own `segments` chunk sums, ties broken by segment
    *    index) instead of global Gaussian quantiles — no float
    *    z-normalization, bit-stable in any engine.
    *
    * Output: (key, segment 0-based, n_hours, paa_sum, symbol
    * 'a'..'a'+alphabet−1). Hours are the key's OBSERVED hours in
    * order; `(rank·segments) div n_hours` assigns chunks, so keys
    * with fewer hours than `segments` simply emit shorter words.
    *
    * Scale shape: one (key, hour) map-side-combined aggregation,
    * then all windows partition BY KEY over hour- and segment-sized
    * frames — never a global window, never a collect.
    */
  def saxWords(
      df: DataFrame, keyCol: String, tsCol: String,
      segments: Int, alphabet: Int): DataFrame = {
    require(segments >= 2 && segments <= 64, s"segments: $segments")
    require(alphabet >= 2 && alphabet <= 26, s"alphabet: $alphabet")
    import org.apache.spark.sql.expressions.Window
    val hourly = df
      .groupBy(col(keyCol), window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("__n"))
      .select(col(keyCol),
        unix_timestamp(col("window.start")).as("__h"), col("__n"))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("__h"))
    val wKey = Window.partitionBy(col(keyCol))
    val chunks = hourly
      .withColumn("__i", row_number().over(wOrd) - lit(1))
      .withColumn("__nh", count(lit(1)).over(wKey))
      .withColumn("segment",
        expr(s"(__i * $segments) div __nh").cast("int"))
      .groupBy(col(keyCol), col("segment"))
      .agg(count(lit(1)).as("n_hours"), sum(col("__n")).as("paa_sum"))
    val wSym = Window.partitionBy(col(keyCol))
      .orderBy(col("paa_sum"), col("segment"))
    chunks
      .withColumn("__q", ntile(alphabet).over(wSym))
      .select(col(keyCol), col("segment"), col("n_hours"), col("paa_sum"),
        expr("chr(96 + __q)").as("symbol"))
  }
}
