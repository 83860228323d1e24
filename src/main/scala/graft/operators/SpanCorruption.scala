package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style span-corruption example prep (Raffel et al. 2020 §3.1.4):
  * each document becomes an (inputs, targets) pair where selected
  * token spans are replaced by one `<extra_id_K>` sentinel each in
  * the inputs and enumerated after their sentinel in the targets —
  * the denoising objective's training rows, materialized by the
  * data pipeline rather than the training loop.
  *
  * The classic sampler draws spans at random per epoch; a 100-TB
  * pipeline wants the draw REPLAYABLE (resume a shard, re-emit
  * byte-identical examples), so span selection here is the engine's
  * cross-engine md5 convention: positions partition into fixed
  * 8-token blocks, a block is corrupted iff md5(id:block) lands in
  * 1 of 3 residue classes (≈ 1/3 of blocks → with a 3-of-8 span,
  * ≈ 12.5% of tokens masked — the paper's 15% ballpark), and the
  * masked span is the block's offsets 3..5. Sentinels number 0,1,…
  * over the doc's corrupted-and-nonempty blocks in position order.
  *
  * Scale shape: one posexplode, per-(doc, block) hash decisions
  * computed row-locally, and ONE doc-keyed exchange shared by the
  * sentinel numbering window and the ordered re-assembly groupBy.
  * (Docs are the partition unit; a single doc's tokens always fit a
  * task — the same bound every text operator here relies on.)
  */
object SpanCorruption {

  /** (id, n_tokens, n_masked, inputs, targets); token split is the
    * single-space convention. Documents whose every block draws
    * clean come through with empty `targets` and untouched `inputs`.
    */
  def corrupt(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    Reserved.check("docs" -> docs)
    val toks = docs
      .select(col(idCol), posexplode(split(col(textCol), " ", -1))
        .as(Seq("pos", "tok")))
      .withColumn("block", expr("pos div 8").cast("long"))
      .withColumn("ofs", pmod(col("pos"), lit(8)))
      .withColumn("corrupted",
        pmod(conv(substring(md5(concat(col(idCol).cast("string"),
          lit(":"), col("block").cast("string"))), 1, 15), 16, 10)
          .cast("long"), lit(3L)) === 0L)
      .withColumn("masked",
        col("corrupted") && col("ofs") >= 3 && col("ofs") <= 5)

    // sentinel index: dense position-order numbering of the doc's
    // blocks that actually masked something
    val maskedBlocks = toks.filter(col("masked"))
      .groupBy(col(idCol), col("block"))
      .agg(count(lit(1)).as("__nm"))
      .withColumn("k", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("block"))) - 1)
      .select(col(idCol), col("block"), col("k"))

    val tagged = toks.join(maskedBlocks, Seq(idCol.toString, "block"), "left")

    val inputPiece = when(!col("masked"), col("tok"))
      .when(col("ofs") === 3, concat(lit("<extra_id_"), col("k"), lit(">")))
    val targetPiece = when(col("masked") && col("ofs") === 3,
      concat(lit("<extra_id_"), col("k"), lit("> "), col("tok")))
      .when(col("masked"), col("tok"))

    tagged
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
        concat_ws(" ", transform(filter(
          sort_array(collect_list(struct(col("pos"), inputPiece.as("p")))),
          s => s("p").isNotNull), s => s("p"))).as("inputs"),
        concat_ws(" ", transform(filter(
          sort_array(collect_list(struct(col("pos"), targetPiece.as("p")))),
          s => s("p").isNotNull), s => s("p"))).as("targets"))
  }
}
