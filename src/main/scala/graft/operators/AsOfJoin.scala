package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal nearest) join: attach to every left row the payload
  * of the right row with the greatest right-time ≤ left-time (backward)
  * or the smallest right-time ≥ left-time (forward) within the same
  * key — the standard point-in-time lookup for feature stores, market
  * data, and event attribution.
  *
  * Scale design (100 TB): the naive formulation is a non-equi join
  * (`l.key = r.key AND r.t <= l.t` + a per-row argmax), which Spark
  * can only plan as a sort-merge join that replays every candidate
  * right row per left row — quadratic in per-key density. Instead we
  * union the two sides, shuffle ONCE on the key, and run a single
  * ordered window pass carrying the most recent right payload forward
  * (`last(_, ignoreNulls)` over rows unbounded-preceding→current).
  * Cost is one exchange + one per-partition sort, linear in
  * |left| + |right|, with no join amplification; per-key skew degrades
  * to a per-key linear scan, never a product.
  *
  * Semantics notes:
  *  - Right rows sort BEFORE left rows at equal (key, time), so the
  *    match is inclusive (≤ / ≥), matching DuckDB/pandas `ASOF JOIN`.
  *  - The caller must ensure at most one right row per (key, time) —
  *    with duplicates the winner is ambiguous in every engine; dedup
  *    upstream if needed.
  *  - Null right times are dropped (a null time cannot be "before"
  *    anything); left rows with null time keep null payloads.
  *  - Payload columns are packed into one struct so all of them come
  *    from the SAME matched right row even when some are null.
  */
object AsOfJoin {

  /** Backward as-of join (the common direction): latest right row at
    * or before each left row's time. Output = all left columns plus
    * `payload` columns (null where no right row qualifies). Payload
    * names must not collide with left column names — rename upstream.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame =
    joined(left, right, key, leftTime, rightTime, payload, forward = false)

  /** Backward as-of join with a staleness bound: like [[backward]],
    * but a match older than `maxGap` (an interval Column for
    * timestamp time columns, e.g. `expr("INTERVAL 30 MINUTES")`, or a
    * numeric Column for numeric time columns) is nulled out — the
    * pandas `merge_asof(tolerance=...)` contract. The bound is
    * applied AFTER the window pass, so it costs one extra predicate,
    * not a second shuffle.
    */
  def backwardWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      maxGap: Column): DataFrame = {
    val withT = joined(left, right, key, leftTime, rightTime, payload,
      forward = false, keepMatchTime = true)
    val fresh = col("__matched_t") >= col(leftTime) - maxGap
    payload.foldLeft(withT) { (df, p) =>
      df.withColumn(p, when(fresh, col(p)))
    }.drop("__matched_t")
  }

  /** Forward as-of join: earliest right row at or after the left time. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame =
    joined(left, right, key, leftTime, rightTime, payload, forward = true)

  /** Backward as-of join against a DIMENSION-sized right side, with
    * ZERO shuffle of the left (fact) side: the right timeline is
    * grouped per key into a time-sorted array of (time, payload)
    * structs — one small shuffle of the dimension only — broadcast,
    * equi-joined, and the match is `element_at(filter(timeline, ≤ t),
    * -1)`: the last qualifying entry of the pre-sorted array. Linear
    * in the per-key timeline length per fact row; use [[backward]]
    * when the right side is fact-scale too. Same semantics as
    * [[backward]] (inclusive bound, null-time right rows dropped,
    * left join).
    */
  def broadcastBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    Reserved.check("left" -> left, "right" -> right)
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide " +
        "with left columns; rename on the right side first")
    val timeline = right
      .where(col(rightTime).isNotNull)
      .groupBy(col(key).as("__k"))
      .agg(sort_array(collect_list(
        struct(col(rightTime).as("__mt") +: payload.map(col): _*)))
        .as("__tl"))
    val lt = col(leftTime)
    // try_element_at: an empty filtered timeline (no entry ≤ t, or a
    // null left time) yields null instead of ANSI's array-index error.
    val matched = try_element_at(
      filter(col("__tl"), e => e.getField("__mt") <= lt), lit(-1))
    left.join(broadcast(timeline), col(key) === col("__k"), "left")
      .withColumn("__match", matched)
      .select(leftCols.map(col) ++
        payload.map(p => col("__match").getField(p).as(p)): _*)
  }

  private def joined(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      forward: Boolean,
      keepMatchTime: Boolean = false): DataFrame = {
    Reserved.check("left" -> left, "right" -> right)
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide " +
        "with left columns; rename on the right side first")

    val l = left
      .withColumn("__k", col(key))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .where(col(rightTime).isNotNull)
      .select(
        col(key).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(col(rightTime).as("__mt") +: payload.map(col): _*).as("__p"))

    // One shuffle: both sides hash-partition on __k, then a single
    // in-partition sort orders each key's timeline. asc for backward
    // (carry the last-seen right payload forward), desc for forward
    // (carry the next right payload backward). __side breaks time
    // ties right-first, making the bound inclusive.
    // nulls_first in BOTH directions: a null-time left row then sees
    // no prior right payload and correctly yields null.
    val ord =
      if (forward) Seq(col("__t").desc_nulls_first, col("__side").asc)
      else Seq(col("__t").asc_nulls_first, col("__side").asc)
    val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchTime =
      if (keepMatchTime) Seq(col("__match").getField("__mt").as("__matched_t"))
      else Nil
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__match").getField(p).as(p)) ++ matchTime: _*)
  }
}
