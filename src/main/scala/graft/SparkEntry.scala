package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY §2) to a
  * Spark plan builder; `oracleSql` carries the DuckDB-equivalent SQL
  * for every SQL-expressible query. Column names and row order are
  * deterministic and identical on both sides (quirk Q6: all ranked
  * output orders by count desc, then key asc).
  */
object SparkEntry {

  /** All registered queries, in declaration order. */
  def defs: Seq[QueryDef] =
    graft.queries.TextQueries.all ++
      graft.queries.RelationalQueries.all ++
      graft.queries.MLQueries.all ++
      graft.queries.ExtensionQueries.all ++
      graft.queries.EventQueries.all

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_top_words")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql.trim)).toMap
}
