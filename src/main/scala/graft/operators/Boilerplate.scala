package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal — the block-tiled analogue of
  * C4's "discard any line that appears ≥ 3 times in the corpus"
  * (Raffel et al. 2020 §2.2) and CCNet's paragraph-hash dedup, for
  * corpora whose documents are flat token streams with no line
  * structure (reference corpus shape: Week5_datingNLP.R:50-51 joins
  * essays into one space-separated string).
  *
  * Documents tile into NON-overlapping fixed-size token blocks
  * (block i = tokens [i·n, (i+1)·n); the trailing partial block
  * counts). A block whose text occurs in `minDf` or more DISTINCT
  * documents is boilerplate; stripping removes every occurrence and
  * reassembles the survivors in order. Tiling (vs the sliding spans
  * of [[Dedup.duplicateSpans]]) makes removal well-defined — covered
  * positions never half-overlap a kept window — and keeps the
  * exploded frame at |tokens|/n rows per doc instead of |tokens|.
  *
  * Scale design (100 TB):
  *  - block construction is row-local (`transform` over a `sequence`
  *    of block starts + `slice` — no explode-then-regroup round trip);
  *  - the document-frequency aggregation shuffles the corpus ONCE,
  *    keyed by block text (Zipf-hot blocks are exactly the boilerplate
  *    being hunted; the two-phase countDistinct partial-aggregates
  *    per-doc repeats map-side);
  *  - the boilerplate set (df >= minDf) is vocabulary-sized — tiny
  *    after the threshold — so marking is an AQE-broadcast equi-join
  *    against the per-doc block list, never a corpus × corpus shape;
  *  - reassembly groups by doc id: one shuffle keyed by the id,
  *    `array_sort` of block structs restores order without a window.
  */
object Boilerplate {

  /** Block-text document frequencies: `(block, df)` for every distinct
    * block text, tiled at `blockSize` tokens. Tokenization is the
    * corpus convention: literal single-space split, empties kept.
    */
  def blockDocFreq(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockSize: Int): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1: $blockSize")
    tiled(docs, idCol, textCol, blockSize)
      .groupBy(col("block"))
      .agg(countDistinct(col(idCol)).as("df"))
  }

  /** Strip blocks with corpus document frequency >= `minDf` from every
    * document. Output: `(idCol, blocks_total, blocks_removed,
    * clean_text)` — one row per input document; a document that was
    * entirely boilerplate keeps an empty `clean_text`.
    */
  def stripFrequentBlocks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockSize: Int,
      minDf: Int): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1: $blockSize")
    require(minDf >= 2, s"minDf must be >= 2: $minDf")
    Reserved.check("docs" -> docs)

    val blocks = tiled(docs, idCol, textCol, blockSize)
    val boiler = blockDocFreq(docs, idCol, textCol, blockSize)
      .where(col("df") >= minDf)
      .select(col("block"), lit(true).as("__boiler"))

    blocks
      .join(boiler, Seq("block"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("blocks_total"),
        count(when(col("__boiler"), 1)).as("blocks_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__boiler").isNull,
                struct(col("bidx"), col("block"))))),
            s => s.getField("block")),
          " ").as("clean_text"))
  }

  /** WITHIN-document repeated-block pruning — the intra-doc
    * complement of [[stripFrequentBlocks]] (CCNet paragraph dedup
    * applied inside one document: scraped pages repeat their own
    * nav/footer blocks; Gopher's repetition FILTERS only score such
    * docs, this TRANSFORM repairs them). The first occurrence of each
    * block text is kept in place; later occurrences are dropped and
    * the survivors reassembled in order.
    *
    * Scale shape: ZERO shuffles. A document's own dedup needs no
    * cross-row information, so the whole transform is one codegen
    * projection per row — tile to a block array, `array_distinct`
    * (which keeps FIRST occurrences in encounter order), re-join.
    * This is the operator's 100-TB argument: corpus-size-independent
    * per-row cost, nothing exchanged.
    *
    * Output: `(idCol, blocks_total, blocks_removed, clean_text)`.
    */
  def dedupWithinDoc(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockSize: Int): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1: $blockSize")
    val toks = split(col(textCol), " ", -1)
    val blocks = transform(
      sequence(lit(0),
        floor((size(toks) - lit(1)) / lit(blockSize)).cast("int")),
      i => array_join(
        slice(toks, i * lit(blockSize) + lit(1), lit(blockSize)), " "))
    // Materialize blocks/kept ONCE per row — three output columns
    // reference them, and projection-level CSE does not span the
    // nested higher-order functions (measured 3× tile work without
    // the staging projections).
    docs
      .select(col(idCol), blocks.as("__blocks"))
      .select(col(idCol), col("__blocks"),
        array_distinct(col("__blocks")).as("__kept"))
      .select(
        col(idCol),
        size(col("__blocks")).cast("long").as("blocks_total"),
        (size(col("__blocks")) - size(col("__kept"))).cast("long")
          .as("blocks_removed"),
        array_join(col("__kept"), " ").as("clean_text"))
  }

  /** Row-local tiling: `(idCol, bidx, block)` — block `bidx` holds
    * tokens `[bidx·n, (bidx+1)·n)` joined by single spaces.
    */
  private def tiled(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockSize: Int): DataFrame = {
    val toks = split(col(textCol), " ", -1)
    docs
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0),
            floor((size(col("__toks")) - lit(1)) / lit(blockSize))
              .cast("int")),
          i => array_join(
            slice(col("__toks"), i * lit(blockSize) + lit(1),
              lit(blockSize)), " "))))
      .select(col(idCol), col("pos").as("bidx"), col("col").as("block"))
  }
}
