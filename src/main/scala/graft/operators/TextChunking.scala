package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size document chunking with overlap — the splitter in front
  * of embedding/RAG/pretraining pipelines. Chunk i of a document
  * covers characters [i·stride, i·stride + size) with
  * stride = size − overlap, so consecutive chunks share `overlap`
  * characters; every non-empty document yields ⌈len/stride⌉ chunks
  * (empty text yields none).
  *
  * Fully relational and shuffle-free: per row, an explode over a
  * computed index sequence plus a substring — codegen end to end,
  * linear in output size, no UDF. Chunk counts use
  * `⌊(len + stride − 1) / stride⌋`; the double division is exact here
  * because string lengths are bounded by 2³¹ ≪ 2⁵³.
  */
object TextChunking {

  def chunkFixed(
      df: DataFrame,
      textCol: String,
      size: Int,
      overlap: Int,
      idxCol: String = "chunk_idx",
      chunkCol: String = "chunk"): DataFrame = {
    require(size > 0, s"size must be positive: $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size): $overlap vs $size")
    val stride = (size - overlap).toLong
    val len = length(col(textCol)).cast("long")
    // last index = (len + stride - 1) div stride - 1; clamp at 0 so the
    // sequence never runs DESCENDING (sequence(0, -1) would!) — the
    // residual filter then drops the lone index of empty documents.
    val lastIdx = greatest(
      ((len + lit(stride - 1)) / lit(stride)).cast("long") - lit(1L),
      lit(0L))
    df.withColumn(idxCol, explode(sequence(lit(0L), lastIdx)))
      .where(col(idxCol) * lit(stride) < len)
      .withColumn(chunkCol,
        substring(col(textCol), (col(idxCol) * lit(stride) + lit(1L)).cast("int"),
          lit(size)))
  }
}
