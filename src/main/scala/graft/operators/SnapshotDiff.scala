package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the data-versioning primitive of an
  * ingest pipeline: given two snapshots of a keyed corpus (last
  * month's crawl and today's), classify every key as `added`,
  * `removed`, `changed`, or `unchanged` by comparing a content
  * fingerprint, so downstream stages (dedup signatures, embeddings,
  * shards) reprocess ONLY the delta instead of the corpus.
  *
  * Plan shape: one full outer join shuffled on the key — the minimum
  * possible for a diff — with the content comparison done on md5
  * fingerprints computed map-side (constant-width regardless of
  * document size, so the shuffle carries 16 bytes of content per row
  * instead of the document). At 100 TB with both snapshots bucketed
  * on the key column the exchange disappears entirely
  * (StorageLayout); `changed`/`added` output is typically a small
  * fraction to feed incremental dedup (`Dedup.
  * incrementalMinhashPairsFromStore`) and re-embedding.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on `keyCol`, fingerprinting
    * `contentCols` (order-sensitive, null-tagged). Returns
    * (key, status) with status ∈ added|removed|changed|unchanged.
    * Keys must be unique per snapshot (enforce upstream — this is a
    * set diff, not a bag diff).
    */
  def diff(
      oldDf: DataFrame, newDf: DataFrame,
      keyCol: String, contentCols: Seq[String]): DataFrame = {
    // \u0001 separates columns — with no separator ("ab","c") and
    // ("a","bc") would fingerprint identically; the \u0002-prefixed
    // null sentinel keeps null distinct from the literal "null".
    def fp(df: DataFrame): DataFrame =
      df.select(col(keyCol).as("key"),
        md5(concat_ws("\u0001",
          contentCols.map(c => coalesce(col(c).cast("string"),
            lit("\u0002null"))): _*)).as("fp"))
    fp(oldDf).withColumnRenamed("fp", "fp_old")
      .join(fp(newDf).withColumnRenamed("fp", "fp_new"),
        Seq("key"), "full_outer")
      .select(col("key"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Per-status counts — the diff's ledger line. */
  def summary(diffDf: DataFrame): DataFrame =
    diffDf.groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
}
