package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark plan builder plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Every query MUST produce a deterministic total row order and
  * identical column names/values to its oracle — the driver sorts
  * columns by name and hash-compares values. Aggregates over doubles
  * are computed in exact decimal then cast to double at the edge so
  * both engines emit bit-identical results regardless of accumulation
  * order.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** SQL-quote a string list for `IN (...)` clauses, escaping quotes. */
  def sqlList(words: Seq[String]): String =
    words.map(w => "'" + w.replace("'", "''") + "'").mkString(", ")
}
