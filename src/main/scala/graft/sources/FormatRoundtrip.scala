package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-format source/sink round-trips, fingerprint-verified -- the
  * format-breadth surface of the engine (SURVEY §2.1's scan family
  * beyond CSV/parquet): a dataset is written to JSON-lines, ORC,
  * and CSV, re-read with the ORIGINAL schema, and each round-trip
  * is fingerprinted with
  * [[graft.operators.DataQuality.tableFingerprint]] -- the ONE
  * definition of the engine's order-free XOR/SUM row-hash
  * convention (a second inlined copy of the separator /
  * 15-hex-md5 / mod-2⁶¹ constants would silently desynchronize
  * from the batch/streaming fingerprint twins on the next edit).
  * Equal fingerprints catch the format-level manglings that matter
  * (CSV null/empty collapse, JSON numeric widening, encoding
  * drift) -- with tableFingerprint's documented caveats: concat_ws
  * drops NULL fields (a NULL-position transposition collides) and
  * a literal U+0001 inside a value collides across the separator
  * boundary, so normalize NULLs/control chars upstream when those
  * hazards apply. A strong differ, not an unconditional bit-level
  * proof.
  *
  * Scale: each leg is one distributed write + one distributed
  * read + one hash aggregate -- no collect, no driver data path;
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
    def fingerprint(d: DataFrame, format: String): DataFrame =
      graft.operators.DataQuality
        .tableFingerprint(d, Seq.empty, hashCols)
        .select(lit(format).as("format"), col("n_rows"),
          col("xor_sig"), col("sum_sig"))
    val schema = df.schema
    // pin the input across the three writes: without it each leg
    // re-executes the input plan, and a nondeterministic input would
    // hand every format DIFFERENT rows -- failing (or spuriously
    // passing) the comparison with no format bug present
    val pinned = df.persist()
    try {
      pinned.count()
      pinned.write.mode("overwrite").json(s"$baseDir/json")
      pinned.write.mode("overwrite").orc(s"$baseDir/orc")
      pinned.write.mode("overwrite")
        .option("header", "true").option("quote", "\"")
        .option("escape", "\"")
        .csv(s"$baseDir/csv")
    } finally pinned.unpersist()
    val backJson = spark.read.schema(schema).json(s"$baseDir/json")
    val backOrc = spark.read.schema(schema).orc(s"$baseDir/orc")
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
