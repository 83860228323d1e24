package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout for multi-dimensional data
  * skipping.
  *
  * Parquet scans prune row groups and files on min/max statistics,
  * but a sort on ONE column makes only that column's ranges narrow —
  * every other predicate column spans its full domain in every file,
  * so `WHERE b = …` still reads everything. Interleaving the bits of
  * two (bucketed) key columns into a single z-value and range-
  * partitioning + sorting on it gives every file a compact rectangle
  * in (a, b) space: min/max on BOTH columns are narrow, and
  * predicates on either dimension (or both) skip most of a 100-TB
  * table. This is the layout trick behind Delta/Iceberg `ZORDER BY`,
  * built here from first principles on open Spark APIs.
  *
  * The z-value is a static expression tree of shift/mask/add terms —
  * whole-stage-codegen'd, no UDF — and the layout write is one range
  * exchange (sampling the z-value distribution) plus a within-
  * partition sort: exactly the shuffle a plain global sort would pay,
  * re-aimed at two dimensions at once.
  */
object ZOrderLayout {

  /** Morton z-value of the low `bits` bits of two non-negative long
    * columns: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Callers bucket raw domains first (e.g. `id % 256`,
    * `epoch(ts) % 256`) — the curve needs small dense coordinates,
    * not raw 64-bit values. `bits` ≤ 31 keeps the result in a
    * non-negative long.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The same curve as a DuckDB/ANSI SQL expression over columns `a`
    * and `b` — the oracle twin of [[zValue]], kept adjacent so the
    * two cannot drift.
    */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"(($a // ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($b // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")

  /** Write `df` to parquet z-ordered on (`aCol`, `bCol`): range-
    * partition on the z-value into `numFiles` files, sort within each,
    * drop the helper column. One exchange; at 100 TB the range
    * boundaries come from Spark's reservoir sampling of the z-value,
    * so file sizes stay balanced even under skewed key distributions.
    */
  def writeZOrdered(
      df: DataFrame, aCol: Column, bCol: Column, bits: Int,
      numFiles: Int, dir: String): Unit = {
    require(!df.columns.contains("__z"),
      "input uses the reserved staging column name __z; rename it upstream")
    df.withColumn("__z", zValue(aCol, bCol, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
