package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact stratified train/test split — per label value, exactly
  * ceil(p · n_label) rows are marked train (the reference's caret
  * `createDataPartition(p=0.7)`, `Week5_datingNLP.R:137-142`, which
  * yields 41,963/17,983 on the real corpus).
  *
  * Spark's `randomSplit`/`sampleBy` are approximate (SURVEY M1). A
  * single rank window partitioned by the label would be exact but
  * funnels the whole corpus through |labels| tasks (binary label ⇒
  * the entire dataset sorted on 2 executors). Instead this runs a
  * two-phase exact split that keeps input-partition parallelism:
  *
  *   1. Stamp each row with its input partition id and `rand(seed)`.
  *   2. Aggregate tiny per-(partition, label) counts (≤ P·L rows).
  *   3. Over those counts, compute integer-exact per-partition train
  *      quotas by largest-remainder apportionment: for label quota
  *      q = ceil(p·n), partition i gets base⌊q·cᵢ/n⌋ plus one of the
  *      (q − Σbase) remainder seats, awarded by largest `(q·cᵢ) mod n`
  *      (pid as deterministic tie-break). Σquotaᵢ = q exactly and
  *      quotaᵢ ≤ cᵢ always, all in integer arithmetic.
  *   4. Broadcast-join quotas back and mark the first quotaᵢ rows of
  *      each (partition, label) group in `rand(seed)` order as train.
  *
  * The rank window in phase 4 partitions by (pid, label) — P·L keys —
  * so the sort parallelism scales with the input partition count, not
  * the label cardinality; no single task ever sees more than one input
  * partition's worth of rows. Every partition contributes ≈ p of its
  * rows, so the sample is stratified by partition as well (lower
  * variance than a global draw).
  *
  * Determinism/exactness contract: the counts branch and the main
  * branch must see the SAME partition membership. Independent scans
  * don't guarantee that — AQE can coalesce the two subtrees of a
  * shared upstream shuffle differently, and round-robin repartition
  * is order-sensitive — so the stamped input is persisted here and
  * both branches read the cached blocks. Intra-partition row order
  * only permutes which rows draw which `rand` value; the split sizes
  * stay exact regardless.
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
    val pid = "__split_pid"
    val r = "__split_r"
    // Persisted: the counts branch and the main branch below must
    // agree on (pid, rand) per row — recomputation under AQE may
    // re-coalesce partitions between the two scans (see scaladoc).
    // ContextCleaner unpersists the blocks once the plan is
    // unreferenced; callers on hot paths already persist slim inputs.
    val stamped = df
      .withColumn(pid, spark_partition_id())
      .withColumn(r, rand(seed))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Phase 2: tiny counts — P·L rows, column-pruned to (pid, label).
    val counts = stamped.groupBy(col(pid), col(labelCol)).agg(count(lit(1)).as("__c"))

    // Phase 3: largest-remainder apportionment, exact in Long math.
    // n, q are per-label; base/rem_rank are per-(label, partition).
    val byLabel = Window.partitionBy(col(labelCol))
    val remOrder = Window
      .partitionBy(col(labelCol))
      .orderBy(col("__mod").desc, col(pid))
    val quotas = counts
      .withColumn("__n", sum(col("__c")).over(byLabel))
      // q = ceil(p·n) via Spark's ceil on the double product — matches
      // the window implementation's ceil(lit(p) * n) semantics.
      .withColumn("__q", ceil(lit(p) * col("__n")).cast("long"))
      // q·c through DECIMAL(38,0): a Long product would overflow near
      // n ≈ 1e12 × partition ≈ 1e7 (q·c ≈ 7e18 ≈ Long.Max). Integral
      // DIV / % of the decimal product are exact, and both results
      // (base ≤ q, mod < n) fit comfortably back in Long.
      .withColumn("__qc", col("__q").cast("decimal(38,0)") * col("__c"))
      .withColumn("__base", expr("CAST(__qc DIV __n AS LONG)"))
      .withColumn("__mod", expr("CAST(__qc % __n AS LONG)"))
      .withColumn("__rem", col("__q") - sum(col("__base")).over(byLabel))
      .withColumn("__seat", row_number().over(remOrder))
      .withColumn("__quota", col("__base") + when(col("__seat") <= col("__rem"), 1L).otherwise(0L))
      .select(col(pid).as("__q_pid"), col(labelCol).as("__q_label"), col("__quota"))

    // Phase 4: local prefix take per (pid, label) in rand order.
    val rn = row_number().over(
      Window.partitionBy(col(pid), col(labelCol)).orderBy(col(r)))
    stamped
      .join(
        broadcast(quotas),
        col(pid) === col("__q_pid") && col(labelCol) <=> col("__q_label"),
        "left")
      .withColumn("__rn", rn)
      .withColumn(isTrainCol, col("__rn") <= coalesce(col("__quota"), lit(0L)))
      .drop(pid, r, "__q_pid", "__q_label", "__quota", "__rn")
  }

  /** (train, test) pair. */
  def split(df: DataFrame, labelCol: String, p: Double, seed: Long)
      : (DataFrame, DataFrame) = {
    val flagged = withSplitFlag(df, labelCol, p, seed)
    (flagged.filter(col("is_train")).drop("is_train"),
      flagged.filter(!col("is_train")).drop("is_train"))
  }
}
