package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Right-censored survival curves — Kaplan-Meier (1958) and the
  * Nelson-Aalen cumulative hazard — for time-to-event questions a
  * pipeline asks constantly ("how long until a signup converts,
  * counting the users who never did?"). Dropping censored subjects
  * biases every naive average; the risk-set estimators use them
  * correctly: a subject censored at time c leaves the risk set at c
  * without contributing an event.
  *
  * Shape: one aggregation to per-duration counts, one DESCENDING
  * cumulative count for the risk sets (n(t) = #{duration ≥ t} —
  * computed as a reversed running sum over the DISTINCT-duration
  * table, never a subject×times range join, which would plan a
  * nested-loop), then the two estimators over the EVENT-STEP table:
  *
  *   NA:  H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ       (a sum — relational)
  *   KM:  S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) (a product — a FOLD)
  *
  * Determinism: each step factor/term is one correctly-rounded IEEE
  * division of exact integers snapped to the 9-dp lattice; the NA
  * sum accumulates in DECIMAL(38,12) (order-free); the KM product
  * is re-folded per prefix IN ASCENDING TIME ORDER over the
  * collected step list — O(k²) factor multiplies for k event steps,
  * fine because k is bounded by distinct event times, and exactly
  * replayable by a recursive CTE. The step table is the one
  * deliberately-global window in this operator; its frame is the
  * distinct-duration table, not the subjects.
  */
object Survival {

  /** Input: one row per subject with an integral `durationCol` and
    * an `eventCol` (1 = event observed at duration, 0 = censored at
    * duration). Output: one row per EVENT time, ascending —
    * (t, n_risk, n_events, km, na_cumhaz), 6-dp edges.
    */
  def curves(
      df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    Reserved.check("input" -> df)
    val byT = df
      .select(col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("long").as("__e"))
      .groupBy(col("__t"))
      .agg(count(lit(1)).as("__all"), sum(col("__e")).as("__d"))
    val wDesc = Window.orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = byT
      .withColumn("__n", sum(col("__all")).over(wDesc))
      .filter(col("__d") >= 1)
      .select(col("__t"), col("__n"), col("__d"),
        round(col("__d").cast("double") / col("__n").cast("double"), 9)
          .as("__term"),
        round(lit(1.0) - col("__d").cast("double") /
          col("__n").cast("double"), 9).as("__factor"))
    val wAsc = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withNa = steps
      .withColumn("__na",
        sum(col("__term").cast(DecimalType(38, 12))).over(wAsc))
    // KM: fold each ascending prefix of the collected factor list —
    // the product has no order-free decomposition, so it is computed
    // exactly as the oracle's recursive CTE computes it
    val packed = withNa
      .agg(sort_array(collect_list(struct(col("__t"), col("__n"),
        col("__d"), col("__factor"), col("__na")))).as("__l"))
    packed
      .select(col("__l"), posexplode(col("__l")).as(Seq("__i", "__s")))
      .select(col("__s.__t").as("t"), col("__s.__n").as("n_risk"),
        col("__s.__d").as("n_events"),
        round(expr(
          "aggregate(slice(__l, 1, __i + 1), 1.0D, " +
            "(a, x) -> a * x.__factor)"), 6).as("km"),
        round(col("__s.__na").cast("double"), 6).as("na_cumhaz"))
  }

  /** Two-group log-rank test (Mantel 1966; Peto & Peto 1972) — the
    * standard "do the two cohorts convert/churn at the same rate"
    * comparison over right-censored durations: at every event time
    * the observed cohort-B events compare against the hypergeometric
    * expectation given the pooled risk sets, and censored subjects
    * count correctly (they leave the risk set without an event —
    * the whole point of the machinery; a naive rate comparison
    * silently drops them).
    *
    * Per event time t (d events pooled, n at risk, n_b of cohort B):
    *
    *   E_t = d·n_b/n                        (rational)
    *   V_t = d(n−d)·n_a·n_b / (n²(n−1))     (rational, n ≥ 2)
    *   z = (O_B − ΣE_t)/√(ΣV_t),  O_B = Σ d_b
    *
    * Exactness: E sums ride the kruskalWallis div+remnano lattice
    * ((d·n_b) div n DECIMAL-summed + remainder fraction nano-snapped
    * and integer-summed); each V_t is ONE written IEEE sequence of
    * exact integers snapped alone to nano and integer-summed
    * (order-free in both engines); z is one IEEE sequence at the
    * micro edge. NULL cohorts/durations drop.
    *
    * Shape: a per-duration rollup + one descending cumulative window
    * per partition — risk sets never form a subject×times join,
    * scale-safe (the [[curves]] shape with a cohort split).
    *
    * Output: (part, n_a, n_b, o_b, e_b_nano, v_nano, z_micro) —
    * partitions with both cohorts populated and ΣV > 0.
    */
  def logRank(
      df: DataFrame, partCol: String, inB: org.apache.spark.sql.Column,
      durationCol: String, eventCol: String): DataFrame = {
    Reserved.check("input" -> df)
    val d38 = DecimalType(38, 0)
    val rows = df
      .filter(inB.isNotNull && col(durationCol).isNotNull)
      .select(col(partCol).as("__p"), inB.as("__b"),
        col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("long").as("__e"))
    val perTime = rows.groupBy(col("__p"), col("__t"))
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("__cb"),
        sum(when(!col("__b"), col("__e")).otherwise(0L)).as("__da"),
        sum(when(col("__b"), col("__e")).otherwise(0L)).as("__db"))
    val wDesc = Window.partitionBy(col("__p"))
      .orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = perTime
      .withColumn("__na", sum(col("__ca")).over(wDesc))
      .withColumn("__nb", sum(col("__cb")).over(wDesc))
      .withColumn("__d", col("__da") + col("__db"))
      .withColumn("__n", col("__na") + col("__nb"))
      .filter(col("__d") > 0)
    val terms = risked.select(col("__p"), col("__db"),
      expr("(__d * __nb) div __n").as("__eq"),
      round(pmod(col("__d") * col("__nb"), col("__n")).cast("double") /
        col("__n").cast("double") * lit(1e9)).cast("long").as("__er"),
      when(col("__n") >= 2,
        round((col("__d") * (col("__n") - col("__d"))).cast("double") *
          col("__na").cast("double") * col("__nb").cast("double") /
          (col("__n").cast("double") * col("__n").cast("double") *
            (col("__n").cast("double") - lit(1.0))) * lit(1e9))
          .cast("long"))
        .otherwise(0L).as("__vn"))
    val sizes = rows.groupBy(col("__p"))
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
    val agg = terms.groupBy(col("__p"))
      .agg(sum(col("__db")).as("o_b"),
        sum(col("__eq").cast(d38)).as("__eqsum"),
        sum(col("__er")).as("__ersum"),
        sum(col("__vn")).as("v_nano"))
      .filter(col("v_nano") > 0)
    sizes.join(agg, "__p")
      .select(col("__p").as(partCol), col("n_a"), col("n_b"),
        col("o_b"),
        (col("__eqsum").cast("long") * lit(1000000000L) +
          col("__ersum")).as("e_b_nano"),
        col("v_nano"),
        round((col("o_b").cast("double") -
          (col("__eqsum").cast("double") +
            col("__ersum").cast("double") / lit(1e9))) /
          sqrt(col("v_nano").cast("double") / lit(1e9)) * lit(1e6))
          .cast("long").as("z_micro"))
  }

  /** Restricted mean survival time (RMST; Royston & Parmar 2013) —
    * the area under the Kaplan-Meier curve from 0 to the horizon
    * `tau`: "expected time-to-convert within the first τ, counting
    * the users who never did" — the single-number summary clinicians
    * and growth teams use when the median never falls below 0.5
    * ([[curves]]' km never crossing 0.5 leaves the median undefined;
    * the τ-restricted mean always exists).
    *
    * The KM step function is constant at km_{i−1} on [t_{i−1}, t_i),
    * so the integral is exact given the steps:
    *
    *   RMST(τ) = Σ_i km_{i−1}·(min(t_i,τ) − min(t_{i−1},τ))
    *             + km_last·max(τ − t_last, 0),   km_0 = 1
    *
    * Exactness: each km is [[curves]]' 6-dp-snapped fold, so
    * km·10⁶ is an exact integer; each step's area accumulates as
    * km_micro × exact integer width on a DECIMAL(38,0) lattice
    * (order-free — no float product anywhere); one cast to double
    * at the 6-dp edge. Callers should pre-scale durations so
    * τ·10⁶ stays comfortably inside the double edge (seconds, not
    * microseconds, for month-scale horizons). Output: ONE row
    * (tau, n_steps, rmst); no events → no steps → empty (RMST
    * degenerates to τ with no curve to integrate — surfaced as
    * absence, not a fabricated row).
    *
    * Shape: [[curves]]' plan plus one ordered window over the
    * EVENT-STEP table (distinct event times — deliberately global,
    * like the step table itself) and a one-row aggregation.
    */
  def rmst(
      df: DataFrame, durationCol: String, eventCol: String,
      tau: Long): DataFrame = {
    require(tau > 0, s"tau: $tau")
    val d38 = DecimalType(38, 0)
    val w = Window.orderBy(col("t"))
    curves(df, durationCol, eventCol)
      .withColumn("__pkm", lag(col("km"), 1, 1.0).over(w))
      .withColumn("__pt", lag(col("t"), 1, 0L).over(w))
      .select(col("t"), col("km"),
        (round(col("__pkm") * lit(1e6)).cast("long").cast(d38) *
          (least(col("t"), lit(tau)) - least(col("__pt"), lit(tau)))
            .cast(d38)).as("__area"))
      .agg(count(lit(1)).as("n_steps"),
        sum(col("__area")).as("__head"),
        max(struct(col("t"), col("km"))).as("__last"))
      // a global agg always emits one row; no steps → no RMST
      .filter(col("n_steps") > 0)
      .select(lit(tau).as("tau"), col("n_steps"),
        round((col("__head") +
          round(col("__last.km") * lit(1e6)).cast("long").cast(d38) *
            greatest(lit(tau) - col("__last.t"), lit(0L)).cast(d38))
          .cast("double") / lit(1e6), 6).as("rmst"))
  }
}
