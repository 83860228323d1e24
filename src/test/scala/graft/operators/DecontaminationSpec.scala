package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Test-set decontamination: the Bloom-prefiltered scale path must
  * return exactly the broadcast-exact path's answer — the bloom only
  * over-approximates, and the verify semi-join removes its false
  * positives. A deliberately sloppy fpp forces false positives
  * through the probe so the verify stage is actually exercised.
  */
class DecontaminationSpec extends SparkSuite {
  import spark.implicits._

  /** Benchmark docs are single 10-token spans; corpus docs at
    * i % 7 == 0 and i == 13 embed one verbatim, everything else is
    * doc-unique filler.
    */
  private def fixtures() = {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "pack my box with five dozen liquor jugs right now")
    ).toDF("doc_id", "text").withColumn("tokens", split($"text", " "))
    val corpus = (0 until 30).map { i =>
      val text =
        if (i % 7 == 0)
          s"intro $i the quick brown fox jumps over the lazy dog tonight outro"
        else if (i == 13)
          "start pack my box with five dozen liquor jugs right now end"
        else (s"filler$i " * 12).trim
      (i.toLong, text)
    }.toDF("doc_id", "text").withColumn("tokens", split($"text", " "))
    (corpus, bench)
  }

  test("bloom path equals the exact path, including at a sloppy fpp") {
    val (corpus, bench) = fixtures()
    val exact = Dedup
      .contaminatedDocs(corpus, bench, "doc_id", "tokens", n = 10)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty, "planted contamination must be found")
    assert(exact.map(_.head) ==
      Seq(0L, 7L, 13L, 14L, 21L, 28L).map(identity))
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = Dedup
        .contaminatedDocsBloom(corpus, bench, "doc_id", "tokens",
          n = 10, fpp = fpp)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(bloom == exact, s"bloom(fpp=$fpp) diverges from exact")
    }
  }

  test("empty benchmark contaminates nothing") {
    val (corpus, bench) = fixtures()
    val out = Dedup.contaminatedDocsBloom(
      corpus, bench.limit(0), "doc_id", "tokens", n = 10)
    assert(out.count() == 0)
  }
}
