package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The decomposed/composed strings are built from explicit \\u
  * escapes — source-file literals would be silently precomposed by
  * the editor and make every assertion vacuous.
  */
class NfcNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private val decomposed = "cafe\u0301 A\u030A"   // e+acute, A+ring
  private val composed = "caf\u00e9 \u00c5"       // é, Å precomposed

  test("composes decomposed sequences; NFC input passes through; " +
      "nulls propagate") {
    assert(decomposed.length === composed.length + 2) // witness real
    val df = Seq(Some(decomposed), Some(composed), None).toDF("s")
    val out = df.select(NfcNormalize(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0) === Some(composed))
    assert(out(1) === Some(composed))
    assert(out(2) === None)
  }

  test("stays inside whole-stage codegen and matches interpreted eval") {
    // repartition: a bare local Seq folds into LocalTableScan with
    // no codegen span at all
    val df = (1 to 50).map(i => s"word$i é$i").toDF("s")
      .repartition(2)
    val q = df.select(NfcNormalize(col("s")).as("n"))
    val gen = q.collect().map(_.getString(0)).toSeq
    // inspect AFTER execution — under AQE the pre-execution plan is
    // a lazy AdaptiveSparkPlan with no codegen spans yet
    val plan = q.queryExecution.executedPlan.toString
    // the AQE final-plan format marks codegen stages with "*(n)"
    assert("""\*\(\d+\) Project \[nfc_normalize""".r
      .findFirstIn(plan).isDefined, plan)
    val interp = df.collect().map(r =>
      java.text.Normalizer.normalize(r.getString(0),
        java.text.Normalizer.Form.NFC)).toSeq
    assert(gen === interp)
  }

  test("hash-equivalence: decomposed and precomposed spellings dedup " +
      "together only after normalization") {
    val docs = Seq((1L, "re\u0301sume\u0301"), (2L, "r\u00e9sum\u00e9"))
      .toDF("doc_id", "text")
    val rawDistinct = docs.select(col("text")).distinct().count()
    val nfcDistinct = docs
      .select(NfcNormalize(col("text")).as("t")).distinct().count()
    assert(rawDistinct === 2L && nfcDistinct === 1L)
  }
}
