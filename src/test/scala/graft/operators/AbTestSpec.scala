package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-checked verdicts against the textbook two-proportion z-test:
  * 10% vs 30% at n=100/100 is z≈3.5 (significant, B wins); 10% vs
  * 17% at the same n is z≈1.45 (not significant).
  */
class AbTestSpec extends SparkSuite {
  import spark.implicits._

  private def cohortRows(
      group: String, nA: Int, cA: Int, nB: Int, cB: Int) =
    (Seq.fill(cA)((group, 0, 1)) ++ Seq.fill(nA - cA)((group, 0, 0)) ++
      Seq.fill(cB)((group, 1, 1)) ++ Seq.fill(nB - cB)((group, 1, 0)))

  test("significant and insignificant gaps get the textbook verdict") {
    val df = (cohortRows("sig", 100, 10, 100, 30) ++
      cohortRows("ns", 100, 10, 100, 17))
      .toDF("grp", "b", "s")
    val out = AbTest.twoProportion(
        df, "grp", col("b") === 1, col("s") === 1)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    assert(out("sig") === ((100L, 10L, 100L, 30L, "b")))
    assert(out("ns") === ((100L, 10L, 100L, 17L, "none")))
  }

  test("winner a when cohort A is significantly higher") {
    val df = cohortRows("g", 100, 30, 100, 10).toDF("grp", "b", "s")
    val out = AbTest.twoProportion(
        df, "grp", col("b") === 1, col("s") === 1)
      .collect().head.getString(5)
    assert(out === "a")
  }

  test("rankSum flags a clean shift and passes interleaved samples") {
    // shifted: A holds ranks 1-10, B ranks 11-20 → U = 100 (max)
    val shifted = (1 to 10).map(i => ("sh", 0, i.toDouble, i.toLong)) ++
      (11 to 20).map(i => ("sh", 1, i.toDouble, i.toLong))
    // interleaved: B on the odd ranks → R_b = 100, U = 100−55 = 45
    val mixed = (1 to 20).map(i => ("mx", i % 2, i.toDouble, i.toLong))
    val df = (shifted ++ mixed).toDF("grp", "b", "v", "tie")
    val out = AbTest.rankSum(df, "grp", col("b") === 1, "v", "tie")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(out("sh") === ((100L, "b_high")))
    assert(out("mx") === ((45L, "none")))
  }

  test("sprt: the LLR is the exact pinned-lattice linear form; " +
      "strong evidence crosses each boundary, thin evidence " +
      "continues; invalid rates refuse") {
    import org.apache.spark.sql.functions.col
    // p0=0.3 -> p1=0.4 at alpha=beta=0.05: per-success +124939
    // micro, per-failure -66947, boundaries +/-1278754 (log10
    // lattice, computed once and pinned — the oracle's constants)
    val h1 = (0 until 48).map(i => ("h1", i % 2 == 0)) // 50% >> p1
    val h0 = (0 until 100).map(i => ("h0", i % 10 == 0)) // 10% << p0
    val thin = (0 until 6).map(i => ("thin", i % 3 == 0))
    val out = AbTest.sprt(
        (h1 ++ h0 ++ thin).toDF("g", "ok"), "g", col("ok"),
        p0 = 0.30, p1 = 0.40)
      .collect().map(r => r.getString(0) -> r).toMap
    def llr(n: Long, c: Long) = c * 124939L + (n - c) * -66947L
    assert(out("h1").getLong(3) === llr(48, 24))
    assert(out("h1").getString(4) === "accept_h1")
    assert(out("h0").getLong(3) === llr(100, 10))
    assert(out("h0").getString(4) === "accept_h0")
    assert(out("thin").getString(4) === "continue")
    intercept[IllegalArgumentException] {
      AbTest.sprt(h1.toDF("g", "ok"), "g", col("ok"), 0.3, 0.3)
    }
  }

  test("cuped: a covariate-explained metric reads theta ~ slope, " +
      "rho2 near 1, and an adjusted lift closer to the planted one " +
      "than the raw (covariate-imbalance-corrected) readout") {
    import org.apache.spark.sql.functions.col
    // y = 2x + 100*treatment: the true lift is 100 and the
    // covariate dominates y's variance (rho2 ~ 0.95); the odd/even
    // cohort split leaves a small x imbalance that biases the RAW
    // difference (120) — exactly what the theta adjustment removes
    val units = (0 until 40).map { i =>
      val x = i.toLong * 10
      val b = i % 2 == 1
      ("g", b, x, 2 * x + (if (b) 100L else 0L))
    }
    val r = AbTest.cuped(units.toDF("g", "b", "x", "y"), "g",
      col("b"), "x", "y").collect().head
    val theta = r.getLong(4)
    val raw = r.getLong(5)
    val adj = r.getLong(6)
    assert(r.getLong(1) === 40L && r.getLong(2) === 20L &&
      r.getLong(3) === 20L)
    assert(theta > 1900000L && theta < 2200000L, s"theta: $r")
    assert(raw === 120000000L, s"raw: $r")
    assert(math.abs(adj - 100000000L) < math.abs(raw - 100000000L),
      s"adjustment must move toward the planted lift: $r")
    assert(r.getLong(7) > 900000L, s"rho2: $r")
    intercept[IllegalArgumentException] {
      AbTest.cuped(Seq(("g", true, 1.5, 2.0)).toDF("g", "b", "x", "y"),
        "g", col("b"), "x", "y")
    }
  }

  test("cuped: a unit with NULL x or NULL y drops ENTIRELY — same " +
      "output as removing the row, never a unit n counts but the " +
      "sums skip") {
    import org.apache.spark.sql.functions.col
    def lf(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    val clean = (0 until 40).map { i =>
      val x = i.toLong * 10
      val b = i % 2 == 1
      ("g", b, lf(x), lf(2 * x + (if (b) 100L else 0L)))
    }
    val nullX: (String, Boolean, java.lang.Long, java.lang.Long) =
      ("g", true, null, lf(999L))
    val nullY: (String, Boolean, java.lang.Long, java.lang.Long) =
      ("g", false, lf(999L), null)
    val base = AbTest.cuped(clean.toDF("g", "b", "x", "y"), "g",
      col("b"), "x", "y").collect().toSeq
    val dirty = AbTest.cuped(
      (clean ++ Seq(nullX, nullY)).toDF("g", "b", "x", "y"), "g",
      col("b"), "x", "y").collect().toSeq
    assert(dirty === base,
      s"NULL-metric units must not shift any statistic:\n$dirty\n$base")
    assert(dirty.head.getLong(1) === 40L,
      "n must not count the dropped units")
  }

  test("msprt: a planted 10x-of-tau lift rejects H0, a null split " +
      "continues with negative llr, and the statistic equals a " +
      "direct replication from the sufficient statistics") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(7)
    val nullG = (1 to 400).map(i =>
      ("null", i % 2 == 1, (rng.nextInt(200) + 100).toLong))
    // lifted group: cohort B shifted by +100 cents (tau = 10 cents)
    val lift = (1 to 400).map { i =>
      val b = i % 2 == 1
      ("lift", b, (rng.nextInt(200) + 100 + (if (b) 100 else 0)).toLong)
    }
    val df = (nullG ++ lift).toDF("g", "b", "x")
    val out = AbTest.msprt(df, "g", col("b"), "x",
        tauMicro = 10000000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(out("lift")._3 === "reject_h0", s"$out")
    assert(out("null")._3 === "continue" && out("null")._2 < 0L,
      s"$out")
    // direct replication of the lifted group's llr10 from the raw
    // sufficient statistics (the exact IEEE sequence)
    val bs = lift.filter(_._2).map(_._3)
    val as = lift.filter(!_._2).map(_._3)
    val (na, nb) = (as.size.toDouble, bs.size.toDouble)
    val vaNum = (BigInt(as.size) * as.map(x => BigInt(x) * BigInt(x)).sum -
      BigInt(as.sum) * BigInt(as.sum)).toDouble
    val vbNum = (BigInt(bs.size) * bs.map(x => BigInt(x) * BigInt(x)).sum -
      BigInt(bs.sum) * BigInt(bs.sum)).toDouble
    val sig2 = (vaNum / na + vbNum / nb) / (na + nb - 2.0)
    val s2 = sig2 * (na + nb) / (na * nb)
    val tau2 = (10000000L * 10000000L).toDouble / 1e12
    val delta = bs.sum.toDouble / nb - as.sum.toDouble / na
    val llr10 = 0.5 * math.log10(s2 / (s2 + tau2)) +
      delta * delta * tau2 / (2.0 * s2 * (s2 + tau2)) /
        2.302585092994046
    assert(out("lift")._2 === math.round(llr10 * 1e6), s"$out vs $llr10")
    assert(out("lift")._1 === math.round(delta * 1e6))
  }

  test("msprt: fractional value columns and reserved __ columns are " +
      "refused eagerly (the rankSum/cuped input policy)") {
    val frac = Seq(("g", true, 1.5)).toDF("g", "b", "x")
    intercept[IllegalArgumentException] {
      AbTest.msprt(frac, "g", col("b"), "x", tauMicro = 1000000L)
    }
    val reserved = Seq(("g", true, 1L)).toDF("g", "b", "__x")
    intercept[IllegalArgumentException] {
      AbTest.msprt(reserved, "g", col("b"), "__x", tauMicro = 1000000L)
    }
  }

  test("smdBalance: identical cohorts read 0/balanced; a 10-unit " +
      "shift at equal spread replays the written IEEE sequence") {
    val eq = (1L to 3L).flatMap(v => Seq(("eq", false, v), ("eq", true, v)))
    val sh = Seq(10L, 12L, 14L, 16L).map(("sh", false, _)) ++
      Seq(20L, 22L, 24L, 26L).map(("sh", true, _))
    val out = AbTest.smdBalance(
        (eq ++ sh).toDF("g", "b", "x"), "g", col("b"), "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("eq").getLong(3) === 0L &&
      out("eq").getString(4) === "balanced", s"${out("eq")}")
    // both cohorts have variance 80/12; md = -10
    val v = 80.0 / 12.0
    val exp = math.round(-10.0 / math.sqrt((v + v) / 2.0) * 1e6)
    assert(out("sh").getLong(3) === exp &&
      out("sh").getString(4) === "imbalanced", s"${out("sh")} vs $exp")
    intercept[IllegalArgumentException] {
      AbTest.smdBalance(
        Seq(("g", true, 1.5)).toDF("g", "b", "x"), "g", col("b"), "x")
    }
  }

  test("wilsonCi: textbook 50/100 bounds; zero successes keep a " +
      "positive-width interval inside [0,1]") {
    val df = ((1 to 50).map(i => ("half", true)) ++
      (1 to 50).map(i => ("half", false)) ++
      (1 to 20).map(i => ("none", false))).toDF("g", "y")
    val out = AbTest.wilsonCi(df, "g", col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    // replicate the written IEEE sequence exactly
    def bounds(n: Long, c: Long): (Long, Long) = {
      val nD = n.toDouble; val p = c.toDouble / nD; val z = 1.96
      val denom = 1.0 + z * z / nD
      val center = (p + z * z / (2.0 * nD)) / denom
      val half = z * math.sqrt(p * (1.0 - p) / nD +
        z * z / (4.0 * nD * nD)) / denom
      (math.round((center - half) * 1e6), math.round((center + half) * 1e6))
    }
    val (lo, hi) = bounds(100L, 50L)
    assert(out("half").getLong(3) === lo && out("half").getLong(4) === hi)
    // the textbook Wilson 95% interval for 50/100 is (0.4038, 0.5962)
    assert(lo === 403830L && hi === 596170L, s"$lo $hi")
    val none = out("none")
    assert(none.getLong(3) === 0L, s"$none") // p̂ = 0 → lo = 0 exactly
    assert(none.getLong(4) > 0L && none.getLong(4) < 1000000L,
      "Wald would collapse to zero width here; Wilson must not")
  }

  test("cmh: hand-computed stratified 2x2 sums; tiny strata and " +
      "NULLs drop") {
    // two identical strata, each n=8, n₁₊=4, n₊₁=4:
    // E = 2, V = 256/448 → vn = 571428571 per stratum
    def stratum(s: String, oExposed: Int): Seq[(String, Boolean, Boolean)] =
      (Seq.fill(oExposed)((s, true, true)) ++
        Seq.fill(4 - oExposed)((s, true, false)) ++
        Seq.fill(4 - oExposed)((s, false, true)) ++
        Seq.fill(oExposed)((s, false, false)))
    // O = 3+3 = 6, E = 4: CMH = 4/1.142857142 → 3500000 micro
    val mild = stratum("s1", 3) ++ stratum("s2", 3)
    val m = AbTest.cmh(mild.toDF("s", "b", "y"), "s", col("b"), col("y"))
      .collect().head
    assert(m.getLong(0) === 2L && m.getLong(1) === 6L)
    assert(m.getLong(2) === 4000000000L)       // e_nano = 4.0
    assert(m.getLong(3) === 1142857142L)       // ΣV nano
    assert(m.getLong(4) === 3500000L && m.getString(5) === "independent")
    // perfect within-stratum association: O = 8, CMH = 16/ΣV = 14
    val strong = stratum("s1", 4) ++ stratum("s2", 4)
    val st = AbTest.cmh(strong.toDF("s", "b", "y"), "s", col("b"),
      col("y")).collect().head
    assert(st.getLong(4) === 14000000L && st.getString(5) === "dependent")
    // a 1-row stratum and NULL cohorts contribute nothing
    val noisy = mild.toDF("s", "b", "y")
      .union(Seq(("tiny", true, true)).toDF("s", "b", "y"))
      .union(Seq(("s1", Option.empty[Boolean], true))
        .toDF("s", "b", "y"))
    val n = AbTest.cmh(noisy, "s", col("b"), col("y")).collect().head
    assert(n.getLong(0) === 2L && n.getLong(4) === 3500000L)
  }
}
