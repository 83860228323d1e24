package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.functions._

import graft.operators.{StratifiedSplit, TrimmedCountVectorizer}

/** Full-corpus replication hook (VERDICT r15 #7, SURVEY §6): the real
  * `okcupid_profiles.csv` (59,946×31) is unobtainable in this offline
  * sandbox, so the reference run's headline anchors are matched in
  * SHAPE on synthetic fixtures everywhere else. This spec is the
  * standing contract for the day a user supplies the real file: point
  * `OKCUPID_CSV` at it (or drop it at the conventional path below) and
  * the §6 anchors are asserted automatically, end to end, against the
  * reference's own recorded run (`out.txt:1`):
  *
  *   - 59,946 profile rows × 31 columns (`R:45`)
  *   - 153,385 distinct DFM terms before trimming (`R:92`)
  *   - 12,857 terms after `dfm_trim(min_docfreq=25, min_termfreq=35)`
  *     (`R:105` — 140,528 removed, 91.6%)
  *   - 41,963 train / 17,983 test from the seed-32984 stratified 70/30
  *     split (`R:137-142`)
  *
  * Accuracy is deliberately asserted as a band, not the reference's
  * 64.24% (`R:186-188`): SURVEY §8 H2 documents that tree SHAPE parity
  * with rpart's greedy growth is not a goal — evaluation-metric parity
  * is, and MLlib's sampled-bin splits legitimately differ at the third
  * decimal. Without the file the test cancels (scalatest `assume`)
  * rather than passes, so a green run can never be mistaken for
  * replication.
  */
class FullCorpusSpec extends SparkSuite {

  private val path = sys.env.getOrElse(
    "OKCUPID_CSV", "/root/data/okcupid_profiles.csv")

  test("real-corpus anchors: 59,946x31 load, 153,385-term DFM, " +
      "12,857 after trim, 41,963/17,983 split, accuracy band") {
    assume(new java.io.File(path).exists(),
      s"real okcupid_profiles.csv not present at $path " +
        "(set OKCUPID_CSV) — SURVEY §6 anchors are only assertable " +
        "on the real corpus; cancelled, not passed")
    val profiles = OkCupidPipeline.load(spark, path)
    assert(profiles.schema.size === 31)
    assert(profiles.count() === 59946L)

    val essays = OkCupidPipeline.withEssays(profiles)
      .withColumn("label", (col("sex") === "m").cast("double"))
    val stages = OkCupidPipeline.featurePipeline().getStages
    val tokens = new Pipeline().setStages(stages.init)
      .fit(essays).transform(essays)
      .select(col("label"), col("tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      assert(tokens
        .select(explode(col("tokens")).as("term"))
        .agg(count_distinct(col("term"))).head.getLong(0) === 153385L,
        "pre-trim DFM feature count (out.txt:1)")
      val model = stages.last.asInstanceOf[TrimmedCountVectorizer]
        .fit(tokens)
      assert(model.vocabulary.length === 12857,
        "post-trim vocabulary (out.txt:1 'Total features removed: " +
          "140,528 (91.6%)')")
      val (train, test) =
        StratifiedSplit.split(tokens, "label", 0.7, 32984L)
      assert(train.count() === 41963L, "train rows (R:137-142)")
      assert(test.count() === 17983L, "test rows (R:137-142)")
    } finally tokens.unpersist()

    // end-to-end train+evaluate on the real corpus: accuracy must land
    // in a band around the reference's 64.24% (±5 points — metric
    // parity, not tree-shape parity; SURVEY §8 H2)
    val (_, acc) = OkCupidPipeline.trainAndEvaluate(profiles)
    assert(acc >= 0.5924 && acc <= 0.6924,
      f"accuracy $acc%.4f outside the 64.24%%±5 band (R:186-188)")
  }
}
