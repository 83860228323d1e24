package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-checked seasonal profiles and centroid summaries. */
class SeasonalSummarizeSpec extends SparkSuite {
  import spark.implicits._

  test("seasonalProfile: per-hour means and deltas vs the key mean") {
    val midnight = 1704067200000000L // 2024-01-01T00:00:00Z in µs
    val rows = Seq(
      ("a", midnight + 60000000L, 100L),             // hour 0
      ("a", midnight + 120000000L, 200L),            // hour 0
      ("a", midnight + 3600000000L + 1000000L, 300L) // hour 1
    ).toDF("k", "us", "cents")
      .select(col("k"), expr("timestamp_micros(us)").as("ts"),
        col("cents"))
    val out = TimeSeries.seasonalProfile(rows, "k", "ts", "cents")
      .orderBy("hour_of_day").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // overall mean = 600/3 = 200 cents = 200_000000 micro
    assert(out.toSeq === Seq(
      (0, 2L, 150000000L, -50000000L),
      (1, 1L, 300000000L, 100000000L)))
  }

  test("centroidSummary ranks sentences by top-term coverage") {
    val docs = Seq((1L, "aa bb aa. aa cc. dd")).toDF("doc_id", "text")
    val out = Summarize.centroidSummary(docs, "doc_id", "text",
        topTerms = 1, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4)))
    // top term is "aa" (3 occurrences); "dd" contains none → not a row
    assert(out.toSeq === Seq(
      (1, 1, "aa bb aa", 2L),
      (2, 2, "aa cc", 1L)))
  }

  test("centroidSummary ties break on sentence position") {
    val docs = Seq((7L, "x y. x z. q")).toDF("doc_id", "text")
    val out = Summarize.centroidSummary(docs, "doc_id", "text",
        topTerms = 1, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getString(3)))
    // both sentences contain "x" once → earlier sentence wins rank 1
    assert(out.toSeq === Seq((1, "x y"), (2, "x z")))
  }

  test("centroidSummary is per-document (no cross-doc leakage)") {
    val docs = Seq(
      (1L, "aa aa. bb."),
      (2L, "bb bb. aa.")).toDF("doc_id", "text")
    val out = Summarize.centroidSummary(docs, "doc_id", "text",
        topTerms = 1, k = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq === Seq((1L, "aa aa"), (2L, "bb bb")))
  }
}
