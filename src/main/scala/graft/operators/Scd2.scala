package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from an append-only
  * change log — the event-sourcing → dimension-table operator: each
  * key's consecutive runs of identical tracked attributes collapse
  * into one validity interval `[valid_from, valid_to)`, with the
  * latest run open-ended (`valid_to` null, `is_current` true).
  *
  * Classic gaps-and-islands, done with two windows and one grouped
  * aggregate:
  *   1. change flag — the attribute tuple differs (null-safely) from
  *      its lag over (key, order);
  *   2. run id — running sum of flags;
  *   3. collapse — group by (key, run), `valid_from` = min order key;
  *   4. interval close — `valid_to` = lead(valid_from) per key.
  *
  * Scale shape: ONE exchange. Both windows and the final lead
  * partition by the key, and the (key, run) groupBy's clustering
  * requirement is already satisfied by the key-hash partitioning the
  * windows installed (equal (key, run) rows are necessarily
  * co-partitioned), so Catalyst plans no further shuffle — asserted
  * by Scd2Spec. Per-key state is the key's log, never the corpus.
  *
  * Determinism: callers must pass `tieCols` making (tsCol, tieCols)
  * unique per key (a change log with duplicate timestamps and no
  * tiebreaker has no well-defined history in ANY engine).
  */
object Scd2 {

  /** Build the SCD2 history table. Output: keyCols ++ attrCols ++
    * (valid_from, valid_to, is_current), one row per run.
    */
  def fromChangeLog(
      log: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys/attrs required")
    Reserved.check("fromChangeLog" -> log)

    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)

    val flagged = log.withColumn("__chg",
      when(!(attrs <=> lag(attrs, 1).over(w)), lit(1L)).otherwise(lit(0L)))
    val runs = flagged.withColumn("__run",
      sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))

    // Within a run every attr tuple is identical, so min() per column
    // reproduces the tuple without a first_value dependency.
    val collapsed = runs
      .groupBy((keyCols.map(col) :+ col("__run")): _*)
      .agg(min(col(tsCol)).as("valid_from"),
        attrCols.map(a => min(col(a)).as(a)): _*)

    val wk = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from").asc)
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
