package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MinhashCalibrationSpec extends SparkSuite {
  import spark.implicits._

  private def shingles(docs: Seq[(Long, String)]) =
    Dedup.shingleSets(
      docs.toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ", -1).as("tokens")),
      "doc_id", "tokens", k = 3)

  test("identical docs calibrate to est = exact = 1e6, err 0") {
    val sh = shingles(Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words here now")))
    val out = Dedup.minhashCalibration(sh, numHashes = 16,
        minExactPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 2L, 1000000L, 1000000L, 0L)))
  }

  test("estimates land within a plausible band of exact and the " +
      "audit is partitioning-independent") {
    // near-dup family: shared 20-token core, distinct 2-token tails
    val core = (0 until 20).map(i => s"core$i").mkString(" ")
    val docs = (1L to 6L).map(i => (i, s"$core tail${i}a tail${i}b"))
    val a = Dedup.minhashCalibration(shingles(docs), 16, 500000L)
      .orderBy("id_a", "id_b").collect().toSeq
    val b = Dedup.minhashCalibration(
        shingles(docs).repartition(7), 16, 500000L)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(a === b && a.nonEmpty)
    a.foreach { r =>
      val (exact, est) = (r.getLong(2), r.getLong(3))
      assert(exact >= 500000L)
      // 16 hashes: est is a multiple of 62500 ppm, within [0, 1e6]
      assert(est % 62500L === 0L && est >= 0L && est <= 1000000L)
      assert(r.getLong(4) === math.abs(est - exact))
    }
  }
}
