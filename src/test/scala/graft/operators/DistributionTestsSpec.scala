package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-checked distribution-test verdicts: χ² for 90/10 vs 50/50 on
  * df=1 (crit 3.8415), KS for a shift of half the range vs perfectly
  * interleaved samples.
  */
class DistributionTestsSpec extends SparkSuite {
  import spark.implicits._

  test("chi-square flags 90/10 and passes 50/50 at df=1") {
    val even = (Seq.fill(50)("A") ++ Seq.fill(50)("B")).toDF("cat")
    val skew = (Seq.fill(90)("A") ++ Seq.fill(10)("B")).toDF("cat")
    val e = DistributionTests.chiSquareUniform(even, "cat", 38415L)
      .collect().head
    assert(e.getDouble(2) === 0.0 && e.getString(3) === "uniform")
    val s = DistributionTests.chiSquareUniform(skew, "cat", 38415L)
      .collect().head
    // chi2 = ((90-50)^2 + (10-50)^2) / 50 = 64
    assert(s.getDouble(2) === 64.0 && s.getString(3) === "nonuniform")
  }

  test("KS flags a half-range shift and passes interleaved samples") {
    val shifted = (1 to 100).map(i => ("sh", 0, i.toDouble, i.toLong)) ++
      (1 to 100).map(i => ("sh", 1, i + 50.0, 1000L + i))
    val mixed = (1 to 200).map(i => ("mx", i % 2, i.toDouble, i.toLong))
    val df = (shifted ++ mixed).toDF("grp", "b", "v", "tie")
    val out = DistributionTests.ksTwoSample(
        df, "grp", col("b") === 1, "v", "tie")
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getString(4)))
      .toMap
    // D is evaluated per merged-order row (the documented, engine-
    // replayable definition): at the first overlapping value the A row
    // sorts before the B row, so the running gap peaks at 51/100
    // rather than the value-level 0.5
    assert(out("sh") === ((0.51, "shifted")))
    assert(out("mx")._2 === "same")
    assert(out("mx")._1 <= 0.01)
  }

  test("cramerVonMises pins the hand-computed interleaved case, " +
      "reads 0 on identical samples, and grows under a shift") {
    // A = {1,3}, B = {2,4}: U = 2*1 + 2*5 = 12 (u4 = 48),
    // T = 12/16 - 15/24 = 0.125
    val inter = Seq(("i", false, 1L), ("i", false, 3L),
      ("i", true, 2L), ("i", true, 4L))
    // identical samples: T = 0 exactly on the midrank lattice
    val same = (1L to 2L).flatMap(v => Seq(("s", false, v), ("s", true, v)))
    // disjoint shift: T approaches its maximum
    val shift = (1L to 10L).map(v => ("d", false, v)) ++
      (11L to 20L).map(v => ("d", true, v))
    val out = DistributionTests.cramerVonMises(
        (inter ++ same ++ shift).toDF("g", "b", "x"), "g", col("b"), "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("i").getLong(1) === 2L && out("i").getLong(2) === 2L)
    assert(out("i").getLong(3) === 48L, s"${out("i")}")
    assert(out("i").getLong(4) === 125000L, s"${out("i")}")
    assert(out("s").getLong(4) === 0L, s"${out("s")}")
    assert(out("d").getLong(4) > 1000000L, s"${out("d")}")
  }

  test("energyDistance pins the hand-computed interleaved case, " +
      "reads 0 on identical samples, and the pair sums match the " +
      "brute-force definition") {
    // A = {0,2}, B = {1,3}: AB = 1+3+1+1 = 6, AA = 2, BB = 2,
    // E = 2*6/4 - 2*2/4 - 2*2/4 = 1, T = (4/4)*1 = 1
    val inter = Seq(("i", false, 0L), ("i", false, 2L),
      ("i", true, 1L), ("i", true, 3L))
    val same = (1L to 2L).flatMap(v => Seq(("s", false, v), ("s", true, v)))
    val out = DistributionTests.energyDistance(
        (inter ++ same).toDF("g", "b", "x"), "g", col("b"), "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("i").getLong(3) === 6L && out("i").getLong(4) === 2L &&
      out("i").getLong(5) === 2L, s"${out("i")}")
    assert(out("i").getLong(6) === 1000000L && out("i").getLong(7) === 1000000L)
    assert(out("s").getLong(6) === 0L, s"${out("s")}")
    // brute-force cross-check on a messier fixture with ties
    val xs = Seq(5L, 9L, 9L, 14L)
    val ys = Seq(2L, 9L, 11L)
    val df = (xs.map(("m", false, _)) ++ ys.map(("m", true, _)))
      .toDF("g", "b", "x")
    val r = DistributionTests.energyDistance(df, "g", col("b"), "x")
      .collect().map(row => row.getString(0) -> row).toMap
    val ab = (for (x <- xs; y <- ys) yield math.abs(x - y)).sum
    val aa = (for (i <- xs.indices; j <- i + 1 until xs.size)
      yield math.abs(xs(i) - xs(j))).sum
    val bb = (for (i <- ys.indices; j <- i + 1 until ys.size)
      yield math.abs(ys(i) - ys(j))).sum
    assert(r("m").getLong(3) === ab && r("m").getLong(4) === aa &&
      r("m").getLong(5) === bb, s"${r("m")} vs ($ab,$aa,$bb)")
  }

  test("psi: identical binned distributions read exactly 0, a " +
      "planted shift lands in the action band, and PSI is symmetric " +
      "under cohort swap") {
    val same = (1 to 60).map(i => ("s", i % 2 == 1, (i % 3).toLong))
    // shift: A mass on bins {0,1}, B mass on bins {1,2}
    val shift = (1 to 30).map(i => ("d", false, (i % 2).toLong)) ++
      (1 to 30).map(i => ("d", true, (i % 2 + 1).toLong))
    val out = DistributionTests.psi(
        (same ++ shift).toDF("g", "b", "bin"), "g", col("b"), "bin")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("s") === 0L, s"$out")
    assert(out("d") > 250000L, s"$out")
    val swapped = DistributionTests.psi(
        shift.map { case (g, b, x) => (g, !b, x) }.toDF("g", "b", "bin"),
        "g", col("b"), "bin")
      .collect().head.getLong(4)
    assert(swapped === out("d"), "PSI must be symmetric")
  }

  test("oneWayAnova matches the hand-computed F on three groups") {
    // g1=[1,2,3] g2=[4,5,6] g3=[7,8,9]: SSB=54, SSW=6,
    // F = (54/2)/(6/6) = 27
    val df = Seq(("g1", 1), ("g1", 2), ("g1", 3), ("g2", 4), ("g2", 5),
      ("g2", 6), ("g3", 7), ("g3", 8), ("g3", 9)).toDF("g", "x")
    val r = DistributionTests.oneWayAnova(df, "g", "x").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 9L)))
    assert(r.getDouble(2) === 54.0 && r.getDouble(3) === 6.0)
    assert(r.getDouble(4) === 27.0)
  }

  test("oneWayAnova: no row when groups are identical (SSW=0 with " +
      "one value per group) or k<2; fractional input rejected") {
    val flat = Seq(("a", 5), ("a", 5), ("b", 5), ("b", 5)).toDF("g", "x")
    assert(DistributionTests.oneWayAnova(flat, "g", "x").count() === 0)
    val one = Seq(("a", 1), ("a", 2)).toDF("g", "x")
    assert(DistributionTests.oneWayAnova(one, "g", "x").count() === 0)
    val frac = Seq(("a", 1.5)).toDF("g", "x")
    val e = intercept[IllegalArgumentException] {
      DistributionTests.oneWayAnova(frac, "g", "x")
    }
    assert(e.getMessage.contains("lattice"))
  }

  test("oneWayAnova is partitioning-independent") {
    val df = (1 to 200).map(i => (s"g${i % 5}", i * 3 % 17)).toDF("g", "x")
    val a = DistributionTests.oneWayAnova(df, "g", "x").collect().toSeq
    val b = DistributionTests.oneWayAnova(df.repartition(13), "g", "x")
      .collect().toSeq
    assert(a === b)
  }

  test("gamesHowell pins the textbook Welch pair: means 5 vs 10, " +
      "variances 2.5 vs 10, t = -5/sqrt(2.5), df from " +
      "Welch-Satterthwaite; q = |t|*sqrt(2); pair table covers " +
      "every g1 < g2") {
    // A: 3,4,5,6,7 (n=5, mean 5, var 2.5, s_A = 0.5)
    // B: 6,8,10,12,14 (n=5, mean 10, var 10, s_B = 2)
    // t = -5/sqrt(2.5) = -3.162278
    // df = 2.5^2 / (0.25/4 + 4/4) = 6.25/1.0625 = 5.882353
    val df = (Seq(3, 4, 5, 6, 7).map(("a", _)) ++
      Seq(6, 8, 10, 12, 14).map(("b", _)) ++
      Seq(1, 1, 1).map(("c", _))) // degenerate: zero variance, n=3
      .toDF("g", "x")
    val out = DistributionTests.gamesHowell(df, "g", "x")
      .orderBy("g1", "g2").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    val ab = out(("a", "b"))
    assert(ab._1 === 5L && ab._2 === 5L)
    assert(ab._3 === math.round(-5.0 / math.sqrt(2.5) * 1e6), s"$ab")
    assert(ab._4 === math.round(6.25 / 1.0625 * 1e6), s"$ab")
    assert(ab._5 === math.round(5.0 / math.sqrt(2.5) * math.sqrt(2.0)
      * 1e6), s"$ab")
    // zero-variance c still pairs against a and b (its SE comes from
    // the other side); all three pairs present
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    // fractional input refused, single-row groups dropped
    intercept[IllegalArgumentException] {
      DistributionTests.gamesHowell(Seq(("a", 1.5)).toDF("g", "x"),
        "g", "x")
    }
    val lone = (Seq(3, 4, 5).map(("a", _)) :+ (("b", 9))).toDF("g", "x")
    val loneOut = DistributionTests.gamesHowell(lone, "g", "x").collect()
    assert(loneOut.isEmpty) // b has n=1 -> no pair survives
  }

  test("psiBinned derives equal-frequency edges from the reference " +
      "cohort: identical cohorts read ~0, a planted shift reads " +
      "well past the 0.25 action band, and a ref-empty group drops") {
    val rng = new scala.util.Random(7)
    val same = (1 to 2000).map(i =>
      ("same", i % 2 == 1, rng.nextInt(1000).toLong))
    val shifted = (1 to 2000).map { i =>
      val b = i % 2 == 1
      ("shift", b, (rng.nextInt(1000) + (if (b) 800 else 0)).toLong)
    }
    val refEmpty = (1 to 50).map(i => ("noref", true, i.toLong))
    val df = (same ++ shifted ++ refEmpty).toDF("g", "b", "x")
    val out = DistributionTests.psiBinned(df, "g", col("b"), "x", 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(!out.contains("noref"), s"$out")
    assert(out("same")._1 === 10L, s"$out")
    assert(math.abs(out("same")._2) < 100000L, s"$out") // PSI < 0.1
    assert(out("shift")._2 > 250000L, s"$out")          // PSI > 0.25
    // fractional values refused (edge derivation would truncate)
    intercept[IllegalArgumentException] {
      DistributionTests.psiBinned(
        Seq(("g", true, 1.5)).toDF("g", "b", "x"), "g", col("b"),
        "x", 10)
    }
    // partition-deterministic (edges are exact order statistics)
    val a = DistributionTests.psiBinned(df, "g", col("b"), "x", 10)
      .orderBy("g").collect().toSeq
    val b2 = DistributionTests.psiBinned(df.repartition(13), "g",
        col("b"), "x", 10)
      .orderBy("g").collect().toSeq
    assert(a === b2)
  }

  test("kuiper pins the hand case, flags a disjoint shift, and sees " +
      "the ECDF crossing KS halves") {
    // A={1,3}, B={2,4}: running diffs 2,0,2,0 → D⁺=2, D⁻=0, V=0.5
    val tiny = Seq(("t", false, 1L), ("t", false, 3L),
      ("t", true, 2L), ("t", true, 4L))
    // disjoint: V = 1.0, shifted
    val shift = (1L to 10L).map(v => ("d", false, v)) ++
      (11L to 20L).map(v => ("d", true, v))
    // crossing: A = 26..75 inside, B = 1..25 ∪ 76..100 outside —
    // D⁺ = D⁻ = 0.5, so V = 1.0 while KS reads only 0.5
    val cross = (26L to 75L).map(v => ("x", false, v)) ++
      ((1L to 25L) ++ (76L to 100L)).map(v => ("x", true, v))
    val df = (tiny ++ shift ++ cross).zipWithIndex
      .map { case ((g, b, v), i) => (g, b, v, i.toLong) }
      .toDF("g", "b", "v", "tie")
    val out = DistributionTests.kuiperTwoSample(
        df, "g", col("b"), "v", "tie")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("t").getDouble(3) === 0.5)
    assert(out("d").getDouble(3) === 1.0 &&
      out("d").getString(4) === "shifted")
    assert(out("x").getDouble(3) === 1.0 &&
      out("x").getString(4) === "shifted")
    val ks = DistributionTests.ksTwoSample(df, "g", col("b"), "v", "tie")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(ks("x") === 0.5) // Kuiper doubles KS on the crossing pair
  }

  test("gTest: zero on an independent table, hand value on a " +
      "2x2 association") {
    // independent 2×2: every cell O = E exactly → G = 0
    val ind = for (a <- Seq("A", "B"); b <- Seq("X", "Y");
      _ <- 1 to 25) yield (a, b)
    val i = DistributionTests.gTest(ind.toDF("a", "b"), "a", "b", 38415L)
      .collect().head
    assert(i.getLong(0) === 100L && i.getLong(3) === 1L)
    assert(i.getDouble(4) === 0.0 && i.getString(5) === "independent")
    // 30/10/10/30: G = 4·(30·ln1.5 + 10·ln0.5) = 20.929926 at 6 dp
    val dep = Seq.fill(30)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
      Seq.fill(10)(("B", "X")) ++ Seq.fill(30)(("B", "Y"))
    val d = DistributionTests.gTest(dep.toDF("a", "b"), "a", "b", 38415L)
      .collect().head
    assert(d.getDouble(4) === 20.929926 && d.getString(5) === "dependent")
  }

  test("andersonDarlingK matches an independent brute-force " +
      "Scholz-Stephens A²akN and separates shifted from same") {
    // direct double implementation of the 1987 midrank formula
    def adk(samples: Seq[Seq[Long]]): Double = {
      val pooled = samples.flatten
      val n = pooled.size
      var total = 0.0
      for (si <- samples) {
        var inner = 0.0
        for (z <- pooled.distinct.sorted) {
          val lj = pooled.count(_ == z).toDouble
          val bj = pooled.count(_ < z) + lj / 2.0
          val ma = si.count(_ < z) + si.count(_ == z) / 2.0
          val den = bj * (n - bj) - n * lj / 4.0
          if (den > 0)
            inner += (lj / n) * math.pow(n * ma - si.size * bj, 2) / den
        }
        total += inner / si.size
      }
      (n - 1).toDouble / n * total
    }
    val rnd = new scala.util.Random(7)
    val same = Seq(Seq.fill(30)(rnd.nextInt(10).toLong),
      Seq.fill(25)(rnd.nextInt(10).toLong),
      Seq.fill(20)(rnd.nextInt(10).toLong))
    val shifted = same.zipWithIndex.map { case (s, i) =>
      if (i == 2) s.map(_ + 4L) else s }
    def run(tag: String, ss: Seq[Seq[Long]]) = DistributionTests
      .andersonDarlingK(
        ss.zipWithIndex.flatMap { case (s, i) =>
          s.map(v => (tag, i.toLong, v)) }.toDF("g", "s", "x"),
        "g", "s", "x")
      .collect().head
    val a = run("same", same)
    assert(a.getLong(1) === 75L && a.getLong(2) === 3L)
    assert(math.abs(a.getLong(3) / 1e6 - adk(same)) < 1e-3,
      s"$a vs ${adk(same)}")
    val b = run("shift", shifted)
    assert(math.abs(b.getLong(3) / 1e6 - adk(shifted)) < 1e-3,
      s"$b vs ${adk(shifted)}")
    // same-dist A² hovers near its k−1 = 2 expectation; the +4 shift
    // drives it far out
    assert(a.getLong(3) < 6000000L, s"$a")
    assert(b.getLong(3) > 10000000L, s"$b")
  }

  test("andersonDarlingK drops degenerate groups: one sample or one " +
      "pooled value") {
    val df = (Seq.fill(10)(("k1", 0L, 5L)) ++
      (1 to 10).map(i => ("const", (i % 2).toLong, 3L)))
      .toDF("g", "s", "x")
    assert(DistributionTests.andersonDarlingK(df, "g", "s", "x")
      .count() === 0L)
  }

  test("wasserstein: a pure shift reads exactly the shift size; " +
      "identical samples read 0; fractional values refused") {
    // A = {0,10}, B = {10,20}: transport distance = 10 exactly
    val shift = Seq(("s", false, 0L), ("s", false, 10L),
      ("s", true, 10L), ("s", true, 20L))
    val same = (1L to 5L).flatMap(v => Seq(("i", false, v), ("i", true, v)))
    val out = DistributionTests.wasserstein(
        (shift ++ same).toDF("g", "b", "x"), "g", col("b"), "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("s").getLong(3) === 10000000L, s"${out("s")}")
    assert(out("i").getLong(3) === 0L, s"${out("i")}")
    intercept[IllegalArgumentException] {
      DistributionTests.wasserstein(
        Seq(("g", true, 1.5)).toDF("g", "b", "x"), "g", col("b"), "x")
    }
  }

  test("bartlett matches an independent brute force; a 4x-scale " +
      "sample flags; degenerate samples drop the group whole") {
    def bart(samples: Seq[Seq[Long]]): Double = {
      val k = samples.size
      val nTot = samples.map(_.size).sum.toDouble
      val vs = samples.map { s =>
        val n = s.size.toDouble
        val sx = s.map(_.toDouble).sum
        val sxx = s.map(v => v.toDouble * v).sum
        (n, (n * sxx - sx * sx) / (n * (n - 1.0)))
      }
      val sp = vs.map { case (n, v) => (n - 1.0) * v }.sum / (nTot - k)
      val num = (nTot - k) * math.log(sp) -
        vs.map { case (n, v) => (n - 1.0) * math.log(v) }.sum
      val c = 1.0 + (vs.map { case (n, _) => 1.0 / (n - 1.0) }.sum -
        1.0 / (nTot - k)) / (3.0 * (k - 1.0))
      num / c
    }
    val rnd = new scala.util.Random(11)
    val even = Seq.fill(3)(Seq.fill(40)((rnd.nextInt(21) - 10).toLong))
    val skewed = even.zipWithIndex.map { case (s, i) =>
      if (i == 2) s.map(_ * 4L) else s }
    def run(tag: String, ss: Seq[Seq[Long]]) = DistributionTests
      .bartlett(
        ss.zipWithIndex.flatMap { case (s, i) =>
          s.map(v => (tag, i.toLong, v)) }.toDF("g", "i", "x"),
        "g", "i", "x", crit4 = 59915L)
      .collect().head
    val e = run("even", even)
    assert(math.abs(e.getDouble(3) - bart(even)) < 1e-4, s"$e")
    assert(e.getString(4) === "homoscedastic", s"$e")
    val s = run("skew", skewed)
    assert(math.abs(s.getDouble(3) - bart(skewed)) < 1e-4, s"$s")
    assert(s.getString(4) === "heteroscedastic", s"$s")
    // a zero-variance sample drops the whole group (k must not
    // silently shrink)
    val degen = (1 to 10).map(i => ("d", (i % 2).toLong,
      if (i % 2 == 0) 5L else (i % 3).toLong))
    assert(DistributionTests.bartlett(
      degen.toDF("g", "i", "x"), "g", "i", "x", 59915L).count() === 0L)
  }

  test("jsDivergence: 0 on identical cohorts, near ln2 on disjoint " +
      "bins, always inside [0, ln2]") {
    val same = (1L to 5L).flatMap(b =>
      (1 to 10).flatMap(_ => Seq(("i", false, b), ("i", true, b))))
    val disjoint = (1L to 5L).flatMap(b =>
      (1 to 20).map(_ => ("d", false, b))) ++
      (11L to 15L).flatMap(b => (1 to 20).map(_ => ("d", true, b)))
    val out = DistributionTests.jsDivergence(
        (same ++ disjoint).toDF("g", "b", "bin"), "g", col("b"), "bin")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("i") === 0L, s"$out")   // pA = pB per bin exactly
    assert(out("d") > 500000L && out("d") <= 693148L, s"$out")
  }

  test("dispersionIndex: exact D on a hand case; constant counts " +
      "read underdispersed; fractional values refused") {
    // five 0s + five 20s: num = 10*2000 - 10000 = 10000, S = 100 →
    // D = 100 exactly, wildly over the Poisson n-1 = 9
    val over = (1 to 10).map(i => ("ov", if (i <= 5) 0L else 20L))
    val const = (1 to 10).map(_ => ("ct", 3L))
    val tiny = (1 to 4).map(_ => ("tn", 2L)) // n too small to call
    val out = DistributionTests.dispersionIndex(
        (over ++ const ++ tiny).toDF("g", "x"), "g", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("ov").getLong(2) === 100000000L &&
      out("ov").getString(3) === "overdispersed", s"${out("ov")}")
    assert(out("ct").getLong(2) === 0L &&
      out("ct").getString(3) === "underdispersed", s"${out("ct")}")
    assert(out("tn").getString(3) === "poisson", s"${out("tn")}")
    intercept[IllegalArgumentException] {
      DistributionTests.dispersionIndex(
        Seq(("g", 1.5)).toDF("g", "x"), "g", "x")
    }
  }

  test("stuartMaxwell3: hand-computed tables, singular and " +
      "wrong-cardinality universes drop") {
    def table(g: String, counts: Map[(String, String), Int]) =
      counts.toSeq.flatMap { case ((a, b), c) =>
        Seq.fill(c)((g, a, b)) }
    // stable-ish: d = (2, −2), V = [[8,−7],[−7,12]] → χ² = 24/47
    val stable = table("st", Map(
      ("x", "x") -> 20, ("x", "y") -> 5,
      ("y", "x") -> 2, ("y", "y") -> 30, ("y", "z") -> 3,
      ("z", "x") -> 1, ("z", "y") -> 2, ("z", "z") -> 37))
    // drifting: d = (20, −10), V = [[20,−15],[−15,20]] → χ² = 4000/175
    val drift = table("dr", Map(
      ("x", "x") -> 10, ("x", "y") -> 15, ("x", "z") -> 5,
      ("y", "y") -> 10, ("y", "z") -> 5, ("z", "z") -> 10))
    // a perfect 1↔2 swap leaves the covariance singular → drop
    val singular = table("sg", Map(
      ("x", "x") -> 10, ("x", "y") -> 20, ("y", "y") -> 10,
      ("z", "z") -> 10))
    // binary universe → not a 3-category test → drop
    val binary = table("b2", Map(("x", "y") -> 5, ("y", "x") -> 3))
    val out = DistributionTests.stuartMaxwell3(
        (stable ++ drift ++ singular ++ binary).toDF("g", "a", "b"),
        "g", "a", "b", crit4 = 59915L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("st").getLong(1) === 100L)
    assert(out("st").getLong(2) === 510638L &&
      out("st").getString(3) === "stable", s"${out("st")}")
    assert(out("dr").getLong(2) === 22857143L &&
      out("dr").getString(3) === "shifted", s"${out("dr")}")
    assert(!out.contains("sg") && !out.contains("b2"))
  }

  test("gamesHowell is partitioning-independent") {
    val df = (1 to 300).map(i => (s"g${i % 4}", (i * 7) % 23))
      .toDF("g", "x")
    val a = DistributionTests.gamesHowell(df, "g", "x")
      .orderBy("g1", "g2").collect().toSeq
    val b = DistributionTests.gamesHowell(df.repartition(13), "g", "x")
      .orderBy("g1", "g2").collect().toSeq
    assert(a === b && a.size === 6)
  }
}
