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
}
