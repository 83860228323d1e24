package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sums — the parallel-scan primitive, and
  * the same two-pass idiom as [[GlobalIds]] generalized from row
  * counts to values: a naive `SUM(v) OVER (ORDER BY key)` has an
  * empty partition spec and funnels the corpus into one partition
  * (the 100-TB cliff); the scale shape is
  *
  *   1. range-partition by the order key, compute the EXCLUSIVE
  *      prefix within each partition by a partition-local window;
  *   2. total each partition (metadata-sized), exclusive-prefix those
  *      totals into per-partition offsets, broadcast them back:
  *      `prefix = offset(partition) + local_prefix`.
  *
  * The layout is pinned with an eager localCheckpoint between the
  * passes for exactly the reason GlobalIds documents: the totals
  * aggregate and the final join are separate plans, and a re-executed
  * range exchange may sample different boundaries.
  *
  * The driving use case is greedy budgeted selection ("take the best
  * documents until the token budget is spent"): the exclusive prefix
  * in quality order is each row's budget position, and
  * `prefix < budget` IS the greedy take — no sequential loop, no
  * single-partition sort.
  *
  * `keys` must be a total order (unique tuple), as in GlobalIds.
  * Null values sum as zero (window SUM skips them in any engine).
  */
object GlobalScan {

  /** Adds `sumCol` = exclusive prefix sum of `valueCol` in the
    * lexicographic order of `keys`.
    */
  def withPrefixSum(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      sumCol: String = "prefix",
      partitions: Int = 0): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    Reserved.check("withPrefixSum" -> df)

    val n = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, keys.map(col): _*)
      .withColumn("__pid", spark_partition_id())

    val local = Window.partitionBy(col("__pid"))
      .orderBy(keys.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val scanned = ranged
      .withColumn("__lps", coalesce(sum(col(valueCol)).over(local), lit(0L)))
      .localCheckpoint(true)

    // #partitions rows: metadata-sized window, not the data.
    val offsets = scanned.groupBy(col("__pid"))
      .agg(coalesce(sum(col(valueCol)), lit(0L)).as("__tot"))
      .withColumn("__off",
        coalesce(
          sum(col("__tot")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))

    scanned
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(sumCol, col("__off") + col("__lps"))
      .drop("__pid", "__lps", "__off")
  }
}
