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

  test("the ElementwiseMin md5 fold is bit-identical to the " +
      "posexplode/groupBy-min reference formulation") {
    // the pre-round-16 calibration path, verbatim: explode the
    // 16-long md5 hash array to narrow (id, seed, h) rows, plain
    // min per (id, seed), count per-pair agreements over a seed
    // join. Pins the reformulated operator (array fold + fused
    // zip_with agreement) IN-SUITE, like MinhashSigSpec does for
    // the xxhash64 bucket path — a regression confined to the new
    // array path can't hide behind the coarse ppm-band test below.
    val core = (0 until 20).map(i => s"core$i").mkString(" ")
    val docs = (1L to 6L).map(i => (i, s"$core tail${i}a tail${i}b"))
    val sh = shingles(docs)
    val seeds = sequence(lit(0), lit(15))
    val hs = sh
      .select(col("id"), posexplode(transform(seeds, s =>
        conv(substring(md5(concat(s.cast("string"), lit(":"),
          col("shingle"))), 1, 15), 16, 10).cast("long"))))
      .withColumnRenamed("pos", "seed").withColumnRenamed("col", "h")
      .groupBy(col("id"), col("seed")).agg(min(col("h")).as("h"))
    val ref = hs.select(col("id").as("id_a"), col("seed"),
        col("h").as("ha"))
      .join(hs.select(col("id").as("id_b"), col("seed"),
        col("h").as("hb")), Seq("seed"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(when(col("ha") === col("hb"), 1L).otherwise(0L))
        .as("matches"))
      .select(col("id_a"), col("id_b"),
        expr("(matches * CAST(1000000 AS BIGINT)) div 16")
          .as("est_ppm"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    val got = Dedup.minhashCalibration(sh, 16, 0L)
      .select(col("id_a"), col("id_b"), col("est_ppm"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, est) =>
      assert(ref((a, b)) === est, s"pair ($a,$b): ref ${ref((a, b))}")
    }
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
