package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact largest-remainder (Hamilton) apportionment: split an integer
  * budget across groups proportionally to integer weights, with the
  * leftover seats going to the largest fractional remainders — the
  * allocation an eval-set carve or a fixed-token-budget mixture uses
  * when "10.37 docs from src4" must become a whole number and the
  * total must land EXACTLY on the budget (independent rounding
  * drifts; largest-remainder is the standard exact fix).
  *
  * All arithmetic is integer: floor share = (budget·w) div T and
  * remainder = budget·w − floor·T, so both engines agree bit-for-bit
  * and no float ever appears. Ties in the remainder rank break on the
  * group key ascending — deterministic, and documented rather than
  * platform-accidental.
  *
  * Scale: the frame windowed is the GROUP-level aggregate (one row
  * per group — sources, languages, shards), bounded and tiny by
  * construction; the corpus itself is touched only by the upstream
  * weight aggregation the caller already ran.
  */
object Apportionment {

  /** (groupCol, weightCol, quota): integer quotas summing exactly to
    * `budget`. Weights must be non-negative; a zero-weight group gets
    * quota 0 unless remainders reach it (they cannot: its remainder
    * is 0 and ties prefer... it can only draw a leftover seat if ALL
    * remainders are 0 and the key sorts early — the degenerate
    * budget > T·k case callers should not construct).
    */
  def largestRemainder(
      weights: DataFrame, groupCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget: $budget")
    Reserved.check("weights" -> weights)
    val total = weights.agg(sum(col(weightCol)).as("__t"))
    val based = weights
      .select(col(groupCol), col(weightCol).cast("long").as("__w"))
      .crossJoin(broadcast(total))
      .select(col(groupCol), col("__w"),
        expr(s"(__w * CAST($budget AS BIGINT)) div __t").as("__floor"),
        expr(s"__w * CAST($budget AS BIGINT) " +
          s"- ((__w * CAST($budget AS BIGINT)) div __t) * __t")
          .as("__rem"))
    val leftover = based.agg((lit(budget) - sum(col("__floor")))
      .as("__left"))
    // group-count-bounded frame: the partition-less rank is over one
    // row per group, never the corpus
    val w = Window.orderBy(col("__rem").desc, col(groupCol).asc)
    based
      .withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(leftover))
      .select(col(groupCol), col("__w").as(weightCol),
        (col("__floor") +
          when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .as("quota"))
  }
}
