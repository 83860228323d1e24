package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the GPT-style pretraining
  * batching step: documents are concatenated in id order and the
  * token stream is cut into fixed-`capacity` chunks; each document is
  * located by its global token offset (`start_tok`), owning chunk
  * (`chunk_id`) and offset within it (`chunk_off`).
  *
  * The global prefix sum is computed WITHOUT a single-partition
  * window over the corpus (the naive `Window.orderBy(id)` plan — a
  * scale-killer): ids are range-sharded, each shard computes its local
  * running sum (window keyed by shard), and the per-shard totals —
  * `corpus/shardSize` rows, bounded — roll up on one tiny window and
  * broadcast back. Two shuffles of (id, count) pairs total, identical
  * output to the global window.
  */
object SequencePacking {

  /** Length-bucketed batch assembly — the padding-waste killer for
    * SEPARATE-sequence training (fine-tuning, encoders, rerankers)
    * where documents cannot be concat-packed like [[pack]]'s causal
    * stream: a batch pads every member to its longest, so batching
    * uniformly random lengths wastes ~half the FLOPs. Standard fix
    * (the bucketing iterator every training framework ships):
    * quantize lengths into buckets, batch WITHIN a bucket, and
    * account the residual waste.
    *
    * Buckets are `len div bucketWidth`; batch order within a bucket
    * is the engine's cross-engine md5 draw (so batch composition is
    * a pure function of ids — reshuffles per epoch belong to
    * [[graft.operators.Sampling.epochShuffle]]'s salt pattern);
    * batches are `batchSize` consecutive draws. Output: one row per
    * (bucket, batch_id) with n_rows, min/max length, token sum, and
    * pad_waste = n·max − sum — the number a pipeline monitors to
    * tune bucketWidth.
    *
    * Scale: one row-local projection + ONE bucket-keyed window
    * exchange + the (bucket, batch) aggregation. A bucket at corpus
    * scale is a large window partition; the documented decomposition
    * is the [[GlobalScan]] range-exchange numbering per bucket — the
    * window form is kept here because bucket cardinality ×
    * bucketWidth bounds are usually chosen to make buckets
    * shard-sized.
    */
  def lengthBuckets(
      df: DataFrame, idCol: String, lenCol: String,
      bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth: $bucketWidth")
    require(batchSize >= 1, s"batchSize: $batchSize")
    Reserved.check("input" -> df)
    val draw = conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long")
    val rows = df
      .select(col(idCol), col(lenCol).cast("long").as("__len"))
      .withColumn("bucket", expr(s"__len div $bucketWidth"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(draw, col(idCol))))
      .withColumn("batch_id", expr(s"(__rn - 1) div $batchSize"))
    rows
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__len")).as("min_len"), max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_len"))
      .withColumn("pad_waste",
        col("n_rows") * col("max_len") - col("sum_len"))
  }

  def pack(
      df: DataFrame, idCol: String, tokenCountCol: String,
      capacity: Long, shardSize: Long = 1L << 20): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      col(tokenCountCol).cast("long").as("ntok"))
      .withColumn("shard", expr(s"doc_id div $shardSize"))
    val wIn = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val local = base.withColumn("cum_local",
      sum(col("ntok")).over(wIn) - col("ntok"))
    // per-shard totals: bounded by corpus/shardSize rows — the one
    // intentionally-tiny single-partition window
    val wSh = Window.orderBy(col("shard"))
    val offsets = base.groupBy(col("shard"))
      .agg(sum(col("ntok")).as("stot"))
      .withColumn("shard_off", sum(col("stot")).over(wSh) - col("stot"))
      .select(col("shard"), col("shard_off"))
    local.join(broadcast(offsets), "shard")
      .withColumn("start_tok", col("cum_local") + col("shard_off"))
      .select(col("doc_id"), col("ntok"), col("start_tok"),
        expr(s"start_tok div $capacity").as("chunk_id"),
        pmod(col("start_tok"), lit(capacity)).as("chunk_off"))
  }
}
