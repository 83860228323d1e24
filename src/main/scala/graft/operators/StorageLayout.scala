package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical storage layout as an operator surface: bucketed tables
  * (pre-shuffled-at-write joins) and partitioned writes (directory-
  * level pruning). The two layout moves a 100-TB deployment makes
  * BEFORE any query runs:
  *
  *  - **Bucketing** pays the shuffle once at write time. Two tables
  *    bucketed on their join key with the SAME bucket count join with
  *    ZERO Exchange — each task reads bucket i of both sides. At
  *    corpus scale this turns the recurring fact-fact join (the
  *    dominant shuffle in any star-join workload) into a local merge;
  *    `sortBy` on the bucket key additionally lets the sort-merge
  *    join skip its per-task sort when files arrive pre-sorted.
  *    [[graft.plans]]' StorageLayoutSpec pins the no-Exchange plan.
  *  - **Partitioning** (hive-style directories) makes the predicate
  *    `WHERE lang = 'en'` a DIRECTORY listing instead of a scan —
  *    PartitionFilters in the plan, zero rows read from other
  *    partitions. The partition column must be low-cardinality
  *    (lang, source, date), never a key: one directory per value.
  *
  * Bucket metadata lives in the session catalog (bucketed reads
  * require `saveAsTable`; a bare `parquet(path)` write drops the
  * bucket spec). The in-memory catalog is per-session — exactly the
  * lifetime the Verify/bench harness needs; a cluster deployment
  * would point the same calls at a shared metastore.
  */
object StorageLayout {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet
    * table at `path`, registered as `table` in the session catalog.
    * Overwrites both data and catalog entry (idempotent re-runs).
    */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    val spark = df.sparkSession
    // Overwrite on an EXISTING external table reuses the old catalog
    // entry's path; drop first so `path` always wins.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Pre-shuffle onto the bucket key so each write task holds whole
    // buckets (repartition and bucketing share the Murmur3 column
    // hash): one file per bucket instead of tasks × buckets smalls.
    df.repartition(numBuckets, df.col(bucketCol))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Register (or refresh) two bucketed tables co-bucketed on their
    * join keys and return them as DataFrames. Same bucket count on
    * both sides — the precondition for a shuffle-free join.
    */
  def coBucketed(
      spark: SparkSession,
      left: DataFrame, leftTable: String, leftKey: String,
      right: DataFrame, rightTable: String, rightKey: String,
      numBuckets: Int, baseDir: String): (DataFrame, DataFrame) = {
    writeBucketed(left, leftTable, s"$baseDir/$leftTable", leftKey, numBuckets)
    writeBucketed(right, rightTable, s"$baseDir/$rightTable", rightKey,
      numBuckets)
    (spark.table(leftTable), spark.table(rightTable))
  }

  /** Hive-style partitioned parquet write (one directory per value of
    * each partition column). Overwrites the target.
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
