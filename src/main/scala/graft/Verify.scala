package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd+ args: run only the named queries (local iteration)
    val only: Set[String] = args.drop(2).toSet
    // Default to the driver's parallelism (32): a 4-CPU default is how
    // the r14 layout-dependent q_confusion pin passed local iteration
    // while failing the driver sweep (VERDICT r14 #3).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Belt-and-braces round artifact (VERDICT r15 #1): two rounds
    // running, the driver's own post-round sweep recorded `{}` into
    // CORRECTNESS_r{N}.json despite a green engine. If the driver-side
    // compare tool is present (it is python/duckdb, NOT engine code —
    // Verify only shells out to it, full runs only), emit a
    // driver-format correctness.json next to oracle_sql.json so the
    // round always has a non-empty artifact to fall back on.
    if (only.isEmpty) {
      val tool = Paths.get("tools/correctness_json.py")
      if (Files.exists(tool)) {
        try {
          val pb = new ProcessBuilder(
            "python3", tool.toString, outDir, sfDir,
            s"$outDir/correctness.json")
          pb.inheritIO()
          val rc = pb.start().waitFor()
          if (rc != 0)
            System.err.println(s"[verify] correctness_json.py rc=$rc")
        } catch { case e: Throwable =>
          System.err.println(
            s"[verify] correctness.json emit skipped: ${e.getMessage}")
        }
      }
    }
  }
}
