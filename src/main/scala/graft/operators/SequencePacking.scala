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
