package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed, sorted tables — Spark's mechanism for CO-LOCATED joins:
  * both sides of a recurring equi-join are written pre-hashed into
  * the same number of buckets on the join key (and sorted within
  * each bucket), so the join compiles to a sort-merge with NO
  * exchange on either side. At 100 TB this converts the fact×fact
  * join's dominant cost — two full-corpus shuffles per query — into
  * a one-time cost paid at write, amortized over every subsequent
  * join, aggregation, or window keyed on the bucket column.
  *
  * Bucketing lives in the catalog (`saveAsTable` + `bucketBy`), not
  * the parquet footer: readers must go through `spark.table`, and
  * both tables must agree on bucket count for the exchange to be
  * elided. `spark.sql.sources.bucketing.enabled` is on by default.
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted external table at `path`,
    * registered as `tableName`. Idempotent (overwrites both data and
    * catalog entry).
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      key: String,
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets: $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** The co-located join: both tables must be bucketed on their join
    * key with the same bucket count — the plan then contains no
    * shuffle exchange (BucketedTablesSpec asserts this on the
    * physical plan, with a non-bucketed control join that DOES
    * exchange).
    */
  def bucketJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame =
    spark.table(leftTable).join(
      spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
