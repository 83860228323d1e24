package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact stratified train/test split — per label value, exactly
  * ceil(p · n_label) rows are marked train (the reference's caret
  * `createDataPartition(p=0.7)`, `Week5_datingNLP.R:137-142`, which
  * yields 41,963/17,983 on the real corpus).
  *
  * Spark's `randomSplit`/`sampleBy` are approximate (SURVEY M1); this
  * ranks rows inside each label partition by `rand(seed)` and takes the
  * exact prefix. One shuffle on the label column; at scale prefer a
  * higher-cardinality salt only if a single label dominates badly
  * enough to exceed one executor's partition (rarely — the window only
  * carries a double per row).
  *
  * CAVEAT for consumers: the output's partitioning is the label hash —
  * as many non-empty partitions as label VALUES. Feeding it directly
  * into compute-heavy downstream work (model training, heavy UDFs)
  * collapses that work's parallelism to the label cardinality;
  * `repartition(...)` the slim result first (see
  * OkCupidPipeline.trainAndEvaluate, where this cost minutes at 60k
  * docs before the rebalance).
  */
object StratifiedSplit {

  /** Adds a boolean `isTrainCol` column; deterministic for a fixed
    * seed, data, and partitioning.
    */
  def withSplitFlag(
      df: DataFrame,
      labelCol: String,
      p: Double,
      seed: Long,
      isTrainCol: String = "is_train"): DataFrame = {
    val byLabel = Window.partitionBy(col(labelCol))
    val rn = row_number().over(byLabel.orderBy(rand(seed)))
    df.withColumn("__n", count(lit(1)).over(byLabel))
      .withColumn("__rn", rn)
      .withColumn(isTrainCol, col("__rn") <= ceil(lit(p) * col("__n")))
      .drop("__n", "__rn")
  }

  /** (train, test) pair. */
  def split(df: DataFrame, labelCol: String, p: Double, seed: Long)
      : (DataFrame, DataFrame) = {
    val flagged = withSplitFlag(df, labelCol, p, seed)
    (flagged.filter(col("is_train")).drop("is_train"),
      flagged.filter(!col("is_train")).drop("is_train"))
  }
}
