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
  * two-phase exact split over synthetic shards:
  *
  *   1. Stamp each row with a shard id and a uniform draw `r`, both
  *      CONTENT-derived: `xxhash64(seed, <all columns>)` mixed two
  *      ways. No `spark_partition_id()`, no `rand()`.
  *   2. Aggregate tiny per-(shard, label) counts (≤ S·L rows).
  *   3. Over those counts, compute integer-exact per-shard train
  *      quotas by largest-remainder apportionment: for label quota
  *      q = ceil(p·n), shard i gets base ⌊q·cᵢ/n⌋ plus one of the
  *      (q − Σbase) remainder seats, awarded by largest `(q·cᵢ) mod n`
  *      (shard id as deterministic tie-break). Σquotaᵢ = q exactly and
  *      quotaᵢ ≤ cᵢ always, all in integer arithmetic.
  *   4. Broadcast-join quotas back and mark the first quotaᵢ rows of
  *      each (shard, label) group in `r` order as train.
  *
  * Why content hashing instead of `spark_partition_id() + rand(seed)`
  * (the previous formulation): both of those are functions of the
  * physical partitioning, so the counts branch and the main branch —
  * two independent scans — could disagree when AQE re-coalesced
  * partitions between them, and the only cure was persisting the
  * full-width stamped corpus (a cache of the entire input to take a
  * sample, plus a CacheManager entry that outlives the call). A
  * content hash is a pure function of the row, so both branches agree
  * under ANY partitioning: nothing is persisted, nothing leaks, and
  * the result is deterministic for (seed, data) alone — stronger than
  * the old (seed, data, partitioning) contract. The phase-4 rank
  * window shuffles on (shard, label) — S·L keys, so sort parallelism
  * scales with the shard count, not the label cardinality.
  *
  * Caveats of content addressing, both harmless to exactness:
  * duplicate rows draw identical (shard, r) and are ordered
  * arbitrarily among themselves (they are indistinguishable anyway);
  * map-typed columns are excluded from the hash (Spark's hash
  * expressions reject MapType), so rows differing only in a map column
  * correlate the same way.
  */
object StratifiedSplit {

  /** Adds a boolean `isTrainCol` column; deterministic for a fixed
    * seed and data, independent of physical partitioning.
    *
    * @param shards synthetic shard count for phase 1; 0 ⇒ the
    *               session's `spark.sql.shuffle.partitions`.
    */
  def withSplitFlag(
      df: DataFrame,
      labelCol: String,
      p: Double,
      seed: Long,
      isTrainCol: String = "is_train",
      shards: Int = 0): DataFrame = {
    val numShards =
      if (shards > 0) shards
      else scala.util.Try(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
        .getOrElse(200)
    val pid = "__split_pid"
    val r = "__split_r"
    // Hash every non-map column (MapType is unhashable in Spark);
    // distinct literal tags decorrelate the shard and draw hashes.
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case u: UserDefinedType[_] => hasMap(u.sqlType)
      case _ => false
    }
    val hashable = df.schema.fields
      .filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name)).toSeq
    require(hashable.nonEmpty,
      "StratifiedSplit needs at least one non-map column to hash")
    def mix(tag: String) =
      xxhash64((lit(tag) +: lit(seed) +: hashable): _*)
    val stamped = df
      .withColumn(pid, pmod(mix("shard"), lit(numShards.toLong)))
      // 2^52 buckets — exact in double, uniform enough for ordering.
      .withColumn(r, pmod(mix("draw"), lit(1L << 52)).cast("double")
        / lit((1L << 52).toDouble))

    // Phase 2: tiny counts — S·L rows, column-pruned to (pid, label).
    val counts = stamped.groupBy(col(pid), col(labelCol)).agg(count(lit(1)).as("__c"))

    // Phase 3: largest-remainder apportionment, exact in Long math.
    // n, q are per-label; base/rem_rank are per-(label, shard).
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
      // n ≈ 1e12 × shard count ≈ 1e7 (q·c ≈ 7e18 ≈ Long.Max). Integral
      // DIV / % of the decimal product are exact, and both results
      // (base ≤ q, mod < n) fit comfortably back in Long.
      .withColumn("__qc", col("__q").cast("decimal(38,0)") * col("__c"))
      .withColumn("__base", expr("CAST(__qc DIV __n AS LONG)"))
      .withColumn("__mod", expr("CAST(__qc % __n AS LONG)"))
      .withColumn("__rem", col("__q") - sum(col("__base")).over(byLabel))
      .withColumn("__seat", row_number().over(remOrder))
      .withColumn("__quota", col("__base") + when(col("__seat") <= col("__rem"), 1L).otherwise(0L))
      .select(col(pid).as("__q_pid"), col(labelCol).as("__q_label"), col("__quota"))

    // Phase 4: local prefix take per (shard, label) in draw order.
    // Ties in r (content-duplicate rows) are broken arbitrarily by the
    // sort — any k of an identical set is the same split.
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

  /** (train, test) pair.
    *
    * Per-class train/test TOTALS are always exactly (ceil(p·n),
    * n − ceil(p·n)) — but row MEMBERSHIP additionally depends on the
    * shard count, and the `shards = 0` default reads the session's
    * `spark.sql.shuffle.partitions`. A caller that pins downstream
    * results to constants (q_confusion's 2×2 oracle) must pass an
    * explicit `shards` so membership is a function of (seed, data)
    * alone, identical across environments.
    */
  def split(df: DataFrame, labelCol: String, p: Double, seed: Long,
      shards: Int = 0): (DataFrame, DataFrame) = {
    val flagged = withSplitFlag(df, labelCol, p, seed, shards = shards)
    (flagged.filter(col("is_train")).drop("is_train"),
      flagged.filter(!col("is_train")).drop("is_train"))
  }
}
