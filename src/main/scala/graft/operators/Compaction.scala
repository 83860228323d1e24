package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance pass a
  * 100 TB lakehouse runs continuously: given per-record sizes, assign
  * records to target-sized output files within each partition so a
  * downstream writer can `partitionBy(part).write` without producing
  * either a million tiny files or one unsplittable monster.
  *
  * Policy: records are laid out in id order per partition and a file
  * boundary falls every `targetSize` bytes of EXCLUSIVE running
  * prefix — `file_idx = ⌊prefix_before / target⌋` — so every file
  * except the last holds at least `targetSize` bytes once its first
  * record lands, files are contiguous id ranges (clusterable), and
  * the assignment is a pure function of (partition, id, size): any
  * two runs — or two engines — produce the same plan.
  *
  * Scale: ONE window exchange partitioned by the table partition key
  * (never a global window); the running sum is per-partition, so skew
  * follows the table's own partition sizing.
  */
object Compaction {

  /** Per-file plan rows: (partCol, file_idx, n_records, bytes),
    * ordered upstream of any writer. Null sizes contribute zero (a
    * record with unknown size still needs a file).
    */
  def plan(
      df: DataFrame, partCol: String, idCol: String, sizeCol: String,
      targetSize: Long): DataFrame = {
    require(targetSize > 0, s"targetSize: $targetSize")
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(partCol), col(idCol),
        coalesce(col(sizeCol).cast("long"), lit(0L)).as("__sz"))
      .withColumn("__prefix", coalesce(sum(col("__sz")).over(w), lit(0L)))
      .withColumn("file_idx", floor(col("__prefix") / targetSize))
      .groupBy(col(partCol), col("file_idx"))
      .agg(count(lit(1)).as("n_records"), sum(col("__sz")).as("bytes"))
  }
}
