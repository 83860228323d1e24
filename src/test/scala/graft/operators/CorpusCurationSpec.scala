package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** CorpusMixing (mixture resampling, per-domain quality selection) and
  * UnigramLM (cross-entropy scoring) semantics.
  */
class CorpusCurationSpec extends SparkSuite {
  import spark.implicits._

  private def docs() = Seq(
    (0L, "en", "a a b"), (1L, "en", "a b c"), (2L, "en", "b c d"),
    (3L, "de", "c d e"), (4L, "de", "d e a"), (5L, "zh", "e a b")
  ).toDF("doc_id", "lang", "text")

  test("resampleByRates: integer rates are exact multiplicities") {
    val out = CorpusMixing.resampleByRates(
      docs(), "doc_id", "lang", Map("en" -> 2.0, "de" -> 1.0, "zh" -> 0.0))
    val counts = out.groupBy("doc_id").count().as[(Long, Long)]
      .collect().toMap
    assert(counts == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    assert(!counts.contains(5L), "rate 0.0 must drop every row")
    // Copy indices are 1-based and dense.
    val copies = out.where($"doc_id" === 0L).select("copy")
      .as[Int].collect().sorted
    assert(copies.toSeq == Seq(1, 2))
  }

  test("resampleByRates: missing key passes through; fractional rate is a fixed subset") {
    val out = CorpusMixing.resampleByRates(
      docs(), "doc_id", "lang", Map("en" -> 0.5))
    // de/zh have no configured rate -> identity.
    assert(out.where($"lang" =!= "en").count() == 3)
    val kept = out.where($"lang" === "en").select("doc_id")
      .as[Long].collect().toSet
    // Deterministic: same verdict regardless of partitioning.
    val kept2 = CorpusMixing.resampleByRates(
      docs().repartition(7, $"text"), "doc_id", "lang", Map("en" -> 0.5))
      .where($"lang" === "en").select("doc_id").as[Long].collect().toSet
    assert(kept == kept2)
    assert(kept.subsetOf(Set(0L, 1L, 2L)))
  }

  test("resampleByRates: realized copies are floor(r) or ceil(r), mean ~ r") {
    // Fixed-seed randomized corpus: 300 rows over 3 keys with
    // fractional rates. Every realized multiplicity must be one of
    // the two admissible integers, and the mean must approximate the
    // rate (hash-uniform draw; 300 rows give +-0.15 at 95%).
    val rnd = new scala.util.Random(7)
    val rates = Map("a" -> 0.3, "b" -> 1.7, "c" -> 2.0)
    val rows = (0 until 300)
      .map(i => (i.toLong, Seq("a", "b", "c")(rnd.nextInt(3))))
    val df = rows.toDF("doc_id", "k")
    val got = CorpusMixing.resampleByRates(df, "doc_id", "k", rates)
      .groupBy("doc_id", "k").count().as[(Long, String, Long)].collect()
    val realized = got.map { case (id, k, n) => (id, k) -> n }.toMap
    for ((id, k) <- rows) {
      val r = rates(k)
      val n = realized.getOrElse((id, k), 0L)
      assert(n == math.floor(r).toLong || n == math.ceil(r).toLong,
        s"doc $id key $k: $n copies for rate $r")
    }
    for ((k, r) <- rates) {
      val ids = rows.filter(_._2 == k)
      val mean = ids.map(x => realized.getOrElse((x._1, k), 0L)).sum
        .toDouble / ids.size
      assert(math.abs(mean - r) < 0.2, s"key $k: mean $mean vs rate $r")
    }
  }

  test("resampleByRates rejects reserved __ columns") {
    val bad = docs().withColumn("__copies", lit(1))
    val e = intercept[IllegalArgumentException] {
      CorpusMixing.resampleByRates(bad, "doc_id", "lang", Map.empty)
    }
    assert(e.getMessage.contains("__copies"))
  }

  test("selectTopFraction keeps ceil(f*n) best rows per domain") {
    val scored = Seq(
      (0L, "en", 0.9), (1L, "en", 0.8), (2L, "en", 0.7), (3L, "en", 0.6),
      (4L, "de", 0.5), (5L, "de", 0.4)
    ).toDF("doc_id", "lang", "quality")
    val out = CorpusMixing
      .selectTopFraction(scored, "lang", "quality", 0.5, "doc_id")
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 2L, "de" -> 1L))
    val en = out.where($"lang" === "en").select("doc_id").as[Long]
      .collect().toSet
    assert(en == Set(0L, 1L), "must keep the highest-scored rows")
  }

  test("selectTopFraction cutoff is exact decimal, not double ceil") {
    // 0.35 in double is 0.35000000000000003…: 0.35 * 20 →
    // 7.000000000000001 → ceil 8 under double arithmetic. The exact
    // decimal cutoff must keep ceil(7/20ths of 20) = 7 rows.
    val scored = (0 until 20).map(i => (i.toLong, "en", 1.0 - i * 0.01))
      .toDF("doc_id", "lang", "quality")
    val out = CorpusMixing
      .selectTopFraction(scored, "lang", "quality", 0.35, "doc_id")
    assert(out.count() == 7L,
      "double ceil(0.35*20) would keep 8; exact decimal keeps 7")
  }

  test("selectTopFraction breaks score ties by ascending tie column") {
    val tied = Seq(
      (10L, "en", 0.5), (11L, "en", 0.5), (12L, "en", 0.5), (13L, "en", 0.5)
    ).toDF("doc_id", "lang", "quality")
    val out = CorpusMixing
      .selectTopFraction(tied, "lang", "quality", 0.5, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(10L, 11L))
  }

  test("temperatureRatesSqrt: √-flattened shares, smallest source keeps all") {
    // 100 'a' rows, 25 'b', 4 'c' → u = 10, 5, 2.
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 125).map(i => (i.toLong, "b")) ++
      (126 to 129).map(i => (i.toLong, "c"))).toDF("id", "src")
    val r = CorpusMixing.temperatureRatesSqrt(df, "src")
      .orderBy("src").collect()
    assert(r.map(_.getLong(1)).toSeq === Seq(100L, 25L, 4L))
    // shares ∝ √n: 10/17, 5/17, 2/17 in ppm
    assert(r.map(_.getLong(2)).toSeq ===
      Seq(math.round(1e6 * 10 / 17.0), math.round(1e6 * 5 / 17.0),
        math.round(1e6 * 2 / 17.0)))
    // rates ∝ u/n = .1, .2, .5, normalized by max (.5): .2, .4, 1.0
    val rates = r.map(_.getDouble(3))
    assert(math.abs(rates(0) - 0.2) < 1e-9)
    assert(math.abs(rates(1) - 0.4) < 1e-9)
    assert(rates(2) === 1.0) // the tail source is never downsampled
  }

  test("temperatureRatesSqrt: equal sources get equal rates of 1") {
    val df = (1 to 20).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
    val r = CorpusMixing.temperatureRatesSqrt(df, "src").collect()
    assert(r.forall(_.getDouble(3) === 1.0))
    assert(r.forall(_.getLong(2) === 250000L))
  }

  test("sourceDrift: a vocabulary-shifted source drifts more than a " +
      "conforming one") {
    val conforming = (1L to 20L).map(i => ("steady", "alpha beta gamma delta"))
    val shifted = (1L to 20L).map(i => ("drifty", "omega omega zeta zeta"))
    val df = (conforming ++ shifted).toDF("source", "text")
    val kl = UnigramLM.sourceDrift(df, "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // both drift from the 50/50 mixture equally here; assert symmetry
    // and positivity instead of a hand value
    assert(kl("steady") > 0 && kl("drifty") > 0)
    val df2 = ((1L to 30L).map(_ => ("majority", "alpha beta gamma")) ++
      (1L to 3L).map(_ => ("minority", "omega zeta eta"))).toDF("source", "text")
    val kl2 = UnigramLM.sourceDrift(df2, "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the majority source IS most of the corpus → near-zero drift;
    // the disjoint minority source diverges hard
    assert(kl2("minority") > kl2("majority"))
    assert(kl2("majority") < 0.1)
  }

  test("crossEntropy: uniform unigram distribution gives log10(V) for every doc") {
    // Cyclic construction: 5 words, 5 docs of 3 tokens, each word
    // appearing exactly 3 times -> p(w) = 1/5 everywhere.
    val w = Vector("a", "b", "c", "d", "e")
    val uniform = (0 until 5)
      .map(i => (i.toLong, s"${w(i)} ${w((i + 1) % 5)} ${w((i + 2) % 5)}"))
      .toDF("doc_id", "text")
    val xents = UnigramLM.crossEntropy(uniform, "doc_id", "text")
      .select("xent").as[Double].collect().distinct
    val expect = BigDecimal(math.log10(5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(xents.toSeq == Seq(expect))
  }

  test("crossEntropy: rarer tokens raise a doc's cross-entropy") {
    val skewed = Seq(
      (0L, "the the the the the the the the"),
      (1L, "the the the the the the the rare")
    ).toDF("doc_id", "text")
    val m = UnigramLM.crossEntropy(skewed, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(m(1L) > m(0L))
  }

  test("crossEntropy with maxVocab: OOV tokens take the 1/total floor") {
    val skewed = Seq(
      (0L, "the the the the"),
      (1L, "the the the rare")
    ).toDF("doc_id", "text")
    // Vocab capped to 1 -> "rare" is OOV. total=8, p(the)=7/8, floor=1/8.
    val m = UnigramLM.crossEntropy(skewed, "doc_id", "text", maxVocab = Some(1))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nlpThe = r9(-math.log10(7.0 / 8.0))
    val nlpOov = r9(-math.log10(1.0 / 8.0))
    assert(m(0L) == r6(nlpThe))
    assert(m(1L) == r6((3 * nlpThe + nlpOov) / 4.0))
  }
}
