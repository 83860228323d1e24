package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: match each point row to every
  * interval row with `lo <= point < hi`. Spark has no native range
  * join operator, and the declarative form — a join whose only
  * condition is two inequalities — plans as a nested-loop join:
  * broadcast NLJ when one side is small, else a cartesian product.
  *
  * Strategy selection, in order of preference at 100 TB:
  *  - `broadcastPointInInterval`: the interval table is a dimension
  *    (price bands, SLA tiers, IP→geo blocks — thousands of rows).
  *    Broadcast it and let the NLJ scan each point against the small
  *    in-memory list. Zero shuffles of the big side; this IS the
  *    right plan, not a compromise — there is no per-point index an
  *    exchange could buy that beats a broadcast scan of O(100) rows.
  *  - `bucketedPointInInterval`: both sides are large. Discretize the
  *    range domain into fixed-width buckets; an interval replicates
  *    into each bucket it overlaps (explode over `sequence`), a point
  *    lands in exactly one, and the match becomes an EQUI-join on
  *    bucket id + an exact residual predicate. One shuffle keyed by
  *    bucket; replication factor = avg interval width / bucketWidth,
  *    chosen by the caller to trade shuffle volume against per-bucket
  *    fan-in. No cartesian anywhere.
  *
  * Both return the same schema: all point columns + all interval
  * columns (names must not collide — rename upstream). Interval
  * semantics are half-open [lo, hi), the usual banding convention;
  * null bounds or points never match.
  */
object RangeJoin {

  /** Small interval side: broadcast nested-loop. */
  def broadcastPointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String): DataFrame =
    points.join(
      broadcast(intervals),
      col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))

  /** Interval × interval overlap join (both sides large): match every
    * left interval `[lLo, lHi]` to every right interval `[rLo, rHi]`
    * with `lLo <= rHi AND rLo <= lHi` (CLOSED-interval overlap — the
    * session-span / genomics convention, unlike the half-open
    * point-in-interval banding above). Declaratively this is a pure
    * inequality join, which Spark plans as a cartesian product — fatal
    * when both sides are large.
    *
    * Grid blocking turns it into an equi-join: each interval
    * replicates into every fixed-width bucket it touches (explode over
    * `sequence`), candidates meet on bucket id, and the exact overlap
    * predicate filters residuals. A genuinely overlapping pair shares
    * EVERY bucket in the overlap region, so to emit it exactly once
    * without a distinct (which would be a second pair-sized shuffle),
    * the join keeps a pair only in the FIRST bucket both sides occupy:
    * `bucket == max(floor(lLo/w), floor(rLo/w))`. One shuffle keyed by
    * bucket; replication factor = avg interval width / bucketWidth.
    * Pick `bucketWidth` near the typical interval length: too narrow
    * replicates wide intervals heavily, too wide piles unrelated
    * intervals into the same bucket (fan-in → per-bucket mini
    * cartesian). Skewed hot buckets (rush hour) are bounded by that
    * fan-in choice; AQE's skew-join split handles the rest.
    *
    * Output: all left columns + all right columns (names must not
    * collide — rename upstream). Null or inverted (`lo > hi`) bounds
    * never match.
    */
  def bucketedIntervalOverlap(
      left: DataFrame,
      lLoCol: String,
      lHiCol: String,
      right: DataFrame,
      rLoCol: String,
      rHiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    Reserved.check("left" -> left, "right" -> right)
    val w = lit(bucketWidth)
    def buckets(df: DataFrame, lo: String, hi: String): DataFrame =
      df.where(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn("__lb", floor(col(lo).cast("double") / w).cast("long"))
        .withColumn("__b",
          explode(sequence(col("__lb"),
            floor(col(hi).cast("double") / w).cast("long"))))
    val l = buckets(left, lLoCol, lHiCol)
      .withColumnRenamed("__lb", "__lbl")
    val r = buckets(right, rLoCol, rHiCol)
      .withColumnRenamed("__lb", "__lbr")
    l.join(r, Seq("__b"))
      .where(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
        col("__b") === greatest(col("__lbl"), col("__lbr")))
      .drop("__b", "__lbl", "__lbr")
  }

  /** Large interval side: bucketed equi-join. `bucketWidth` is in the
    * units of the range domain (cast to double); intervals wider than
    * ~1000× bucketWidth will replicate heavily — pick a width near
    * the typical interval length.
    */
  def bucketedPointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    Reserved.check("points" -> points, "intervals" -> intervals)
    val w = lit(bucketWidth)
    // Interval [lo, hi) overlaps buckets floor(lo/w)..floor(hi/w).
    // The hi bucket is included even when hi is on a boundary — the
    // residual predicate discards the one spurious candidate, which
    // is cheaper than branching on exact divisibility.
    val ivals = intervals
      .where(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) < col(hiCol))
      .withColumn("__b",
        explode(sequence(
          floor(col(loCol).cast("double") / w).cast("long"),
          floor(col(hiCol).cast("double") / w).cast("long"))))
    val pts = points
      .where(col(pointCol).isNotNull)
      .withColumn("__b",
        floor(col(pointCol).cast("double") / w).cast("long"))
    pts.join(ivals, Seq("__b"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__b")
  }
}
