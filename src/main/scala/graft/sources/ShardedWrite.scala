package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard sink: materialize a curated corpus as size-bounded,
  * id-clustered parquet shards plus a manifest — the layout a
  * dataloader consumes (sequential reads of one shard each, sized to
  * worker memory, with a shard→id-range index for resumption and
  * deterministic interleaving).
  *
  * Scale design:
  *  - the per-file row bound is enforced by `maxRecordsPerFile`
  *    (task-local splitting as rows stream out — no count pass and no
  *    second shuffle);
  *  - the range exchange on the id is the ONLY shuffle and doubles as
  *    the global clustering a contiguous-shard layout needs: within a
  *    task rows arrive sorted, so consecutive files cover disjoint id
  *    ranges;
  *  - the manifest is file-count-sized, computed by one read-back
  *    grouped on `input_file_name()`, and written under `_manifest`
  *    (underscore-prefixed: invisible to readers of the data dir,
  *    like `_SUCCESS`).
  */
object ShardedWrite {

  /** Write `df` under `outDir/data` with at most `rowsPerShard` rows
    * per parquet file, clustered by `idCol`; write and return the
    * manifest (shard, n_rows, min_id, max_id), ordered by id range.
    * `targetTasks` bounds the range exchange width (defaults to the
    * session shuffle parallelism).
    */
  def writeSharded(
      df: DataFrame,
      outDir: String,
      idCol: String,
      rowsPerShard: Long,
      targetTasks: Int = 0): DataFrame = {
    require(rowsPerShard > 0, s"rowsPerShard: $rowsPerShard")
    val spark = df.sparkSession
    val n = if (targetTasks > 0) targetTasks
            else spark.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, col(idCol))
      .sortWithinPartitions(col(idCol))
      .write.option("maxRecordsPerFile", rowsPerShard)
      .mode("overwrite").parquet(s"$outDir/data")
    // manifest records shard BASENAMES, not the absolute URIs
    // input_file_name() returns: an absolute manifest silently keeps
    // pointing a relocated corpus (s3 version-dir copy, HDFS
    // migration) at the OLD paths — readers resolve the basename
    // against their own outDir at read time instead
    val manifest = spark.read.parquet(s"$outDir/data")
      .select(regexp_extract(input_file_name(), "[^/]+$", 0)
        .as("shard"),
        col(idCol).cast("long").as("__id"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__id")).as("min_id"),
        max(col("__id")).as("max_id"))
      .orderBy(col("min_id"))
    manifest.write.mode("overwrite").parquet(s"$outDir/_manifest")
    spark.read.parquet(s"$outDir/_manifest")
  }

  /** The shard files whose [min_id, max_id] intersects [lo, hi]
    * (basenames resolved against THIS outDir — relocation-safe),
    * plus the total shard count. The manifest is file-count-sized,
    * so this is a bounded driver-side collect by design — the same
    * class of driver state as a broadcast codebook.
    */
  def pruneShards(
      spark: org.apache.spark.sql.SparkSession,
      outDir: String, lo: Long, hi: Long): (Seq[String], Long) = {
    val m = spark.read.parquet(s"$outDir/_manifest")
    val total = m.count()
    val files = m.filter(col("max_id") >= lo && col("min_id") <= hi)
      .orderBy(col("min_id"))
      .collect().map { r =>
        val shard = r.getString(0)
        // manifests written before the basename format recorded the
        // absolute URIs input_file_name() returns; prepending
        // outDir/data/ to those would resolve to garbage paths
        // (outDir/data/hdfs://...), so any entry that is already a
        // path — contains '/' (URI schemes always do) — passes
        // through unmodified
        if (shard.contains("/")) shard else s"$outDir/data/$shard"
      }.toSeq
    (files, total)
  }

  /** Manifest-pruned range read — the dataloader's resume/slice path
    * and the batch engine's data-skipping read: open ONLY the shards
    * whose id range intersects [lo, hi] (the range exchange at write
    * time made shard ranges disjoint, so a narrow slice touches few
    * files regardless of corpus size), with a residual id filter for
    * exactness at shard boundaries.
    */
  def readRange(
      spark: org.apache.spark.sql.SparkSession,
      outDir: String, idCol: String, lo: Long, hi: Long): DataFrame = {
    val (files, _) = pruneShards(spark, outDir, lo, hi)
    if (files.isEmpty)
      spark.read.parquet(s"$outDir/data").filter(lit(false))
    else
      spark.read.parquet(files: _*)
        .filter(col(idCol) >= lo && col(idCol) <= hi)
  }
}
