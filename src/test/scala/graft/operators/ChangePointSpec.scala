package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ChangePointSpec extends SparkSuite {
  import spark.implicits._

  test("cusum finds a level shift at its exact index") {
    // series a: [1,1,1,5,5,5] — n=6, Σx=18; n·S_i = 6·ps_i − i·18
    // = [−12,−24,−36,−24,−12] for i=1..5; argmax |·| at i=3
    val df = (1 to 6).map(i => ("a", i.toLong, if (i <= 3) 1L else 5L))
      .toDF("s", "i", "x")
    val out = ChangePoint.cusum(df, "s", "i", "x").collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 3L)    // change_idx
    assert(out.head.getLong(2) === -36L)  // ns_dev (ran below mean)
    assert(out.head.getLong(3) === 6L)    // n
  }

  test("cusum tie breaks to the earliest index; short series drop") {
    // symmetric series [2,0,0,2]: n·S = [4,−4,−12? ] compute:
    // Σ=4, ps=[2,2,2]; nS_i = 4·ps−4i = [4,0,−4] → |4| ties at i=1,3
    val df = Seq(("t", 1L, 2L), ("t", 2L, 0L), ("t", 3L, 0L),
      ("t", 4L, 2L), ("solo", 1L, 9L)).toDF("s", "i", "x")
    val out = ChangePoint.cusum(df, "s", "i", "x").collect()
    assert(out.length === 1) // "solo" (n=1) dropped
    assert(out.head.getString(0) === "t")
    assert(out.head.getLong(1) === 1L)
  }

  test("autocorr matches the hand-computed lattice value") {
    // x = [1,2,3,4]: r_1 = 0.25 exactly (num·n² = 20, den·n² = 80)
    val df = (1 to 4).map(i => ("a", i.toLong, i.toLong)).toDF("s", "i", "x")
    val out = ChangePoint.autocorr(df, "s", "i", "x", maxLag = 2)
      .orderBy("lag").collect()
    assert(out.length === 2)
    assert(out.head.getLong(1) === 1L)
    assert(out.head.getLong(3) === 250000L) // r_1 = 0.25
    // r_2: pairs (1,3),(2,4): sxy=3+8=11, sh=3, st=7;
    // num = 16·11 − 4·10·10 + 2·100 = −24; r_2 = −24/80 = −0.3
    assert(out.last.getLong(3) === -300000L)
  }

  test("autocorr drops zero-variance series") {
    val df = (1 to 5).map(i => ("c", i.toLong, 7L)).toDF("s", "i", "x")
    assert(ChangePoint.autocorr(df, "s", "i", "x", 2).count() === 0L)
  }

  test("ljungBox: hand-computed Q on an alternating series; short " +
      "and zero-variance series drop") {
    // x = [1,0]×5, n=10, S=5: den = 100·5 − 10·25 = 250;
    // num₁ = −225 (r₁=−0.9), num₂ = 200 (r₂=0.8), num₃ = −175
    // (r₃=−0.7); Q = 10·12·(0.81/9 + 0.64/8 + 0.49/7) = 28.8
    val alt = (1 to 10).map(i => ("a", i.toLong, (i % 2).toLong))
    val short5 = (1 to 5).map(i => ("sh", i.toLong, i.toLong)) // n ≤ h+1+1? n=5 > 4 keeps
    val flat = (1 to 9).map(i => ("f", i.toLong, 4L))
    val out = ChangePoint.ljungBox(
        (alt ++ short5 ++ flat).toDF("s", "i", "x"),
        "s", "i", "x", maxLag = 3, crit4 = 78147L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("f")) // zero variance
    val a = out("a")
    assert(a.getLong(1) === 10L && a.getLong(2) === 3L)
    assert(a.getDouble(3) === 28.8)
    assert(a.getString(4) === "autocorrelated")
    // n=5 > maxLag+1=4 keeps the ramp; its Q replays the brute force
    val sh = out("sh")
    val xs = (1 to 5).map(_.toDouble)
    val mean = xs.sum / 5
    val d0 = xs.map(v => (v - mean) * (v - mean)).sum
    val q = 5.0 * 7.0 * (1 to 3).map { l =>
      val r = (0 until 5 - l)
        .map(t => (xs(t) - mean) * (xs(t + l) - mean)).sum / d0
      r * r / (5 - l)
    }.sum
    assert(math.abs(sh.getDouble(3) - q) < 1e-5, s"$sh vs $q")
  }

  test("ljungBox drops series at or under maxLag + 1 points") {
    val df = (1 to 4).map(i => ("t", i.toLong, i.toLong)).toDF("s", "i", "x")
    assert(ChangePoint.ljungBox(df, "s", "i", "x", 3, 78147L)
      .count() === 0L)
  }

  test("pacf matches a brute-force Durbin-Levinson; degenerate " +
      "series drop") {
    // brute force over the same full-mean ACF definition
    def brute(xs: Seq[Double]): Seq[Double] = {
      val n = xs.size
      val m = xs.sum / n
      val d0 = xs.map(v => (v - m) * (v - m)).sum
      def r(l: Int) =
        (0 until n - l).map(t => (xs(t) - m) * (xs(t + l) - m)).sum / d0
      val (r1, r2, r3) = (r(1), r(2), r(3))
      val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
      val p21 = r1 - p22 * r1
      val p33 = (r3 - p21 * r2 - p22 * r1) /
        (1.0 - p21 * r1 - p22 * r2)
      Seq(r1, p22, p33)
    }
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L, 8L)
    val df = (xs.zipWithIndex.map { case (x, i) =>
        ("pi", (i + 1).toLong, x) } ++
      (1 to 9).map(i => ("flat", i.toLong, 7L)))
      .toDF("s", "i", "x")
    val out = ChangePoint.pacf(df, "s", "i", "x")
      .orderBy("lag").collect().filter(_.getString(0) == "pi")
    val exp = brute(xs.map(_.toDouble))
    assert(out.length === 3)
    out.zip(exp).foreach { case (row, e) =>
      assert(math.abs(row.getLong(3) - math.round(e * 1e6)) <= 1L,
        s"lag ${row.getLong(1)}: ${row.getLong(3)} vs $e")
    }
    // zero-variance series dropped whole
    assert(ChangePoint.pacf(df, "s", "i", "x")
      .filter(col("s") === "flat").count() === 0L)
  }

  test("dickeyFuller: brute-force OLS t-ratio; strong mean reversion " +
      "reads stationary; degenerate regressor drops") {
    def brute(xs: Seq[Long]): (Double, Double) = {
      val us = xs.dropRight(1).map(_.toDouble)
      val vs = xs.sliding(2).map { case Seq(a, b) => (b - a).toDouble }
        .toSeq
      val n = us.size.toDouble
      val suu = n * us.map(u => u * u).sum - us.sum * us.sum
      val suv = n * us.zip(vs).map { case (u, v) => u * v }.sum -
        us.sum * vs.sum
      val svv = n * vs.map(v => v * v).sum - vs.sum * vs.sum
      val beta = suv / suu
      val t = beta / math.sqrt((svv - suv * suv / suu) /
        ((n - 2.0) * suu))
      (beta, t)
    }
    // near-alternating with jitter (a PERFECT alternation has zero
    // residual variance and is deliberately refused): violently
    // mean-reverting, β ≈ −2
    val alt = (1 to 16).map(i =>
      (if (i % 2 == 1) 10L else 0L) + (if (i % 5 == 0) 1L else 0L))
    // seeded random walk of ±1 steps
    val rng = new scala.util.Random(5)
    val rw = (1 to 30).scanLeft(100L)((a, _) =>
      a + (if (rng.nextBoolean()) 1L else -1L)).tail
    val flat = Seq.fill(8)(7L)
    val df = (alt.zipWithIndex.map { case (x, i) => ("a", (i + 1).toLong, x) } ++
      rw.zipWithIndex.map { case (x, i) => ("r", (i + 1).toLong, x) } ++
      flat.zipWithIndex.map { case (x, i) => ("f", (i + 1).toLong, x) })
      .toDF("s", "i", "x")
    val out = ChangePoint.dickeyFuller(df, "s", "i", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("f")) // zero regressor variance
    // a perfect fit (zero RSS) is refused, not Inf
    val perfect = (1 to 10).map(i =>
      ("p", i.toLong, if (i % 2 == 1) 10L else 0L)).toDF("s", "i", "x")
    assert(ChangePoint.dickeyFuller(perfect, "s", "i", "x").count() === 0L)
    val (ba, ta) = brute(alt.map(identity))
    assert(out("a").getLong(2) === math.round(ba * 1e6), s"${out("a")}")
    assert(out("a").getLong(3) === math.round(ta * 1e6), s"${out("a")}")
    assert(out("a").getString(4) === "stationary")
    val (_, tr) = brute(rw)
    assert(out("r").getLong(3) === math.round(tr * 1e6), s"${out("r")}")
    assert(out("r").getString(4) ===
      (if (tr < -2.86) "stationary" else "unit_root"))
  }

  test("adfLag1: brute-force 3x3 normal-equations t-ratio; collinear " +
      "augmentation and short series drop") {
    // independent path: UNCENTERED design with explicit intercept,
    // 3x3 Gaussian-free Cramer solve, PER-POINT residuals, and the
    // explicit (X'X)^-1 cofactor for se(beta) — none of the
    // operator's centered-sufficient-sum identities
    def brute(xs: Seq[Long]): Double = {
      val rows = (2 until xs.size).map { t =>
        ((xs(t) - xs(t - 1)).toDouble, xs(t - 1).toDouble,
          (xs(t - 1) - xs(t - 2)).toDouble)
      }
      val n = rows.size.toDouble
      val (sv, sp, sq) = (rows.map(_._1).sum, rows.map(_._2).sum,
        rows.map(_._3).sum)
      val spp = rows.map(r => r._2 * r._2).sum
      val sqq = rows.map(r => r._3 * r._3).sum
      val spq = rows.map(r => r._2 * r._3).sum
      val svp = rows.map(r => r._1 * r._2).sum
      val svq = rows.map(r => r._1 * r._3).sum
      // solve M·(a,b,c) = rhs by plain Gaussian elimination,
      // M = [[n,sp,sq],[sp,spp,spq],[sq,spq,sqq]]
      def solve3(m0: Array[Array[Double]], r0: Array[Double])
          : Array[Double] = {
        val m = m0.map(_.clone); val r = r0.clone
        for (k <- 0 until 3; j <- (k + 1) until 3) {
          val f = m(j)(k) / m(k)(k)
          for (c <- k until 3) m(j)(c) -= f * m(k)(c)
          r(j) -= f * r(k)
        }
        val x = new Array[Double](3)
        for (k <- 2 to 0 by -1) {
          x(k) = (r(k) - ((k + 1) until 3)
            .map(c => m(k)(c) * x(c)).sum) / m(k)(k)
        }
        x
      }
      val m = Array(Array(n, sp, sq), Array(sp, spp, spq),
        Array(sq, spq, sqq))
      val Array(a, b, c) = solve3(m, Array(sv, svp, svq))
      val rss = rows.map { case (v, p, q) =>
        val e = v - (a + b * p + c * q); e * e
      }.sum
      // [(X'X)^-1]_bb via solving M·z = e_b (unit vector)
      val invBB = solve3(m, Array(0.0, 1.0, 0.0))(1)
      b / math.sqrt(rss / (n - 3.0) * invBB)
    }
    val alt = (1 to 16).map(i =>
      (if (i % 2 == 1) 10L else 0L) + (if (i % 5 == 0) 1L else 0L))
    val rng = new scala.util.Random(5)
    val rw = (1 to 30).scanLeft(100L)((acc, _) =>
      acc + (if (rng.nextBoolean()) 1L else -1L)).tail
    // i.i.d. noise around a level: decisively stationary under ADF(1)
    val noise = (1 to 40).map(i => 100L + ((i * 7919) % 11).toLong)
    val df = (alt.zipWithIndex.map { case (x, i) =>
        ("a", (i + 1).toLong, x) } ++
      rw.zipWithIndex.map { case (x, i) => ("r", (i + 1).toLong, x) } ++
      noise.zipWithIndex.map { case (x, i) => ("w", (i + 1).toLong, x) })
      .toDF("s", "i", "x")
    val out = ChangePoint.adfLag1(df, "s", "i", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    for ((name, series) <- Seq("a" -> alt, "r" -> rw.map(identity),
        "w" -> noise)) {
      val t = brute(series)
      assert(math.abs(out(name).getLong(3) - math.round(t * 1e6)) <= 2L,
        s"$name: op=${out(name).getLong(3)} brute=${math.round(t * 1e6)}")
      assert(out(name).getString(4) ===
        (if (out(name).getLong(3) < -2860000L) "stationary"
         else "unit_root"))
    }
    assert(out("w").getString(4) === "stationary") // level reversion
    // perfect alternation: q = 2p - 10 is collinear with (1, p) —
    // the exact-DECIMAL singular-design guard drops it, not a 1/0
    val perfect = (1 to 12).map(i =>
      ("c", i.toLong, if (i % 2 == 1) 10L else 0L)).toDF("s", "i", "x")
    assert(ChangePoint.adfLag1(perfect, "s", "i", "x").count() === 0L)
    // 6 points -> 4 triples < 5: dropped
    val short = (1 to 6).map(i => ("sh", i.toLong, alt(i - 1)))
      .toDF("s", "i", "x")
    assert(ChangePoint.adfLag1(short, "s", "i", "x").count() === 0L)
  }

  test("grangerLag1: planted lead-lag is detected and both ordered " +
      "pairs match a brute-force two-regressor OLS F") {
    def bruteF(cause: Seq[Long], effect: Seq[Long]): Double = {
      val ys = effect.drop(1).map(_.toDouble)
      val ps = effect.dropRight(1).map(_.toDouble)
      val qs = cause.dropRight(1).map(_.toDouble)
      val n = ys.size.toDouble
      def c(a: Seq[Double], b: Seq[Double]) =
        n * a.zip(b).map { case (u, v) => u * v }.sum - a.sum * b.sum
      val (spp, sqq, spq) = (c(ps, ps), c(qs, qs), c(ps, qs))
      val (syp, syq, syy) = (c(ys, ps), c(ys, qs), c(ys, ys))
      val det = spp * sqq - spq * spq
      val b = (syp * sqq - syq * spq) / det
      val cc = (syq * spp - syp * spq) / det
      val rssr = syy - syp * syp / spp
      val rssu = syy - b * syp - cc * syq
      (rssr - rssu) / (rssu / (n - 3.0))
    }
    val rng = new scala.util.Random(9)
    val xs = (1 to 24).map(_ => rng.nextInt(10).toLong)
    // y follows yesterday's x, plus deterministic jitter
    val ys = xs.indices.map(t =>
      (if (t == 0) 5L else xs(t - 1)) * 3L + (t % 3).toLong)
    val df = (xs.zipWithIndex.map { case (v, i) =>
        ("x", (i + 1).toLong, v) } ++
      ys.zipWithIndex.map { case (v, i) => ("y", (i + 1).toLong, v) })
      .toDF("s", "i", "v")
    val out = ChangePoint.grangerLag1(df, "s", "i", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val fXy = bruteF(xs, ys)
    val fYx = bruteF(ys, xs)
    assert(out(("x", "y")) === math.round(fXy * 1e6),
      s"${out(("x", "y"))} vs $fXy")
    assert(out(("y", "x")) === math.round(fYx * 1e6),
      s"${out(("y", "x"))} vs $fYx")
    // the planted direction dominates by orders of magnitude
    assert(out(("x", "y")) > 100L * math.max(1L, out(("y", "x"))),
      s"$out")
  }

  test("grangerLag1: a calendar gap in one series drops the affected " +
      "lag pairs instead of shifting alignment") {
    def bruteF(triples: Seq[(Long, Long, Long)]): Double = {
      val n = triples.size.toDouble
      val ys = triples.map(_._1.toDouble)
      val ps = triples.map(_._2.toDouble)
      val qs = triples.map(_._3.toDouble)
      def c(a: Seq[Double], b: Seq[Double]) =
        n * a.zip(b).map { case (u, v) => u * v }.sum - a.sum * b.sum
      val (spp, sqq, spq) = (c(ps, ps), c(qs, qs), c(ps, qs))
      val (syp, syq, syy) = (c(ys, ps), c(ys, qs), c(ys, ys))
      val det = spp * sqq - spq * spq
      val b = (syp * sqq - syq * spq) / det
      val cc = (syq * spp - syp * spq) / det
      val rssr = syy - syp * syp / spp
      val rssu = syy - b * syp - cc * syq
      (rssr - rssu) / (rssu / (n - 3.0))
    }
    val rng = new scala.util.Random(17)
    def v(s: String, i: Long) = (s.hashCode * 31 + i * 7) % 13 + 13
    val xs = (1L to 12L).map(i => ("x", i, v("x", i) + rng.nextInt(3)))
    // y is missing day 5: pairs at t = 5 (y_5 gone) and t = 6
    // (y_5 = y_{t-1} gone) must DROP for effect y; for effect x the
    // cause-side q = y_5 is gone only at t = 6
    val ys = (1L to 12L).filter(_ != 5L)
      .map(i => ("y", i, v("y", i) + rng.nextInt(3)))
    val df = (xs ++ ys).toDF("s", "i", "v")
    val rows = ChangePoint.grangerLag1(df, "s", "i", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xm = xs.map { case (_, i, x) => i -> x }.toMap
    val ym = ys.map { case (_, i, x) => i -> x }.toMap
    val xyTriples = (2L to 12L).flatMap { t =>
      for (y <- ym.get(t); p <- ym.get(t - 1); q <- xm.get(t - 1))
        yield (y, p, q)
    }
    val yxTriples = (2L to 12L).flatMap { t =>
      for (y <- xm.get(t); p <- xm.get(t - 1); q <- ym.get(t - 1))
        yield (y, p, q)
    }
    // effect y: t ∈ {2,3,4} ∪ {7..12} (t = 5 and 6 drop); effect x:
    // all t but 6 (q = y_5 missing)
    assert(xyTriples.size === 9 && yxTriples.size === 10)
    assert(rows(("x", "y")).getLong(2) === 9L)
    assert(rows(("y", "x")).getLong(2) === 10L)
    assert(rows(("x", "y")).getLong(3) ===
      math.round(bruteF(xyTriples) * 1e6))
    assert(rows(("y", "x")).getLong(3) ===
      math.round(bruteF(yxTriples) * 1e6))
  }

  test("durbinWatson: exact rationals and verdict bands") {
    // ramp [1,2,3,4]: Σd²=3, num=12; den = 4·30−100 = 20 → d = 0.6
    val ramp = (1 to 4).map(i => ("r", i.toLong, i.toLong))
    // alternating [1,0]×3: Σd²=5, num=30; den = 6·3−9 = 9 → d = 10/3
    val alt = (1 to 6).map(i => ("a", i.toLong, (i % 2).toLong))
    // mixed [1,3,2,4]: Σd²=9, num=36; den = 4·30−100 = 20 → d = 1.8
    val mix = Seq(("m", 1L, 1L), ("m", 2L, 3L), ("m", 3L, 2L),
      ("m", 4L, 4L))
    val flat = (1 to 5).map(i => ("f", i.toLong, 2L))
    val out = ChangePoint.durbinWatson(
        (ramp ++ alt ++ mix ++ flat).toDF("s", "i", "x"), "s", "i", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("f"))
    assert(out("r").getDouble(2) === 0.6 &&
      out("r").getString(3) === "positive")
    assert(out("a").getDouble(2) === 3.333333 &&
      out("a").getString(3) === "negative")
    assert(out("m").getDouble(2) === 1.8 &&
      out("m").getString(3) === "none")
  }

  test("adfFromSums: centered sums past the DECIMAL(38,0) product " +
      "bound raise loudly instead of silently dropping the series") {
    // ADVICE r15: spp*sqq on DECIMAL(38,0) inputs nulls out past
    // precision 38 under non-ANSI mode, and `null =!= x` would have
    // silently DROPPED the series while the DuckDB oracle's HUGEINT
    // path errors. Feed synthetic per-series sums whose centered spp
    // exceeds the 10^19-1 factor bound and demand the raise.
    import spark.implicits._
    val big = BigDecimal("20000000000000000000") // 2e19 > bound
    val in = Seq(("g", 10L, 1L, 1L, 1L)).toDF("s", "n", "__sv", "__sp", "__sq")
      .withColumn("__svp", lit(1L).cast("decimal(38,0)"))
      .withColumn("__svq", lit(1L).cast("decimal(38,0)"))
      .withColumn("__spq", lit(1L).cast("decimal(38,0)"))
      .withColumn("__spp", lit(big.bigDecimal).cast("decimal(38,0)"))
      .withColumn("__sqq", lit(1L).cast("decimal(38,0)"))
      .withColumn("__svv", lit(1L).cast("decimal(38,0)"))
    val e = intercept[Exception] {
      ChangePoint.adfFromSums(in, "s").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("adfFromSums")),
      s"expected the loud overflow raise, got: $e")
    // and the in-bound path is untouched: the brute-force test above
    // plus a quick sanity row here
    val ok = Seq(("g", 10L, 5L, 3L, 2L)).toDF("s", "n", "__sv", "__sp", "__sq")
      .withColumn("__svp", lit(40L).cast("decimal(38,0)"))
      .withColumn("__svq", lit(30L).cast("decimal(38,0)"))
      .withColumn("__spq", lit(20L).cast("decimal(38,0)"))
      .withColumn("__spp", lit(90L).cast("decimal(38,0)"))
      .withColumn("__sqq", lit(80L).cast("decimal(38,0)"))
      .withColumn("__svv", lit(70L).cast("decimal(38,0)"))
    assert(ChangePoint.adfFromSums(ok, "s").count() === 1L)
  }

  test("dickeyFullerFromSums overflow guard fires for eligible series " +
      "and stays silent for series the n-threshold would drop") {
    // ADVICE r16: the raise_error guard rode as one conjunct of a
    // Filter whose siblings (n >= 4) Catalyst may reorder — a 2-pair
    // series with overflowing sums could abort the job instead of
    // being dropped. Eligibility is now folded INTO the when(), so:
    //  (a) an n >= 4 series past the bound still raises loudly,
    //  (b) an n < 4 series past the bound drops silently under ANY
    //      conjunct ordering.
    // The guard is the NON-ANSI safety net (under ANSI the decimal
    // product itself throws, loudly, for every overflowing series —
    // including via codegen subexpression elimination, before any
    // conditional can skip it), so pin ansi off for this test.
    import spark.implicits._
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
    val big = BigDecimal("20000000000000000000") // 2e19 > 10^19-1
    def sums(n: Long) =
      Seq(("g", n)).toDF("s", "n")
        .withColumn("__su", lit(big.bigDecimal).cast("decimal(38,0)"))
        .withColumn("__sv", lit(1L).cast("decimal(38,0)"))
        .withColumn("__suu", lit(1L).cast("decimal(38,0)"))
        .withColumn("__suv", lit(1L).cast("decimal(38,0)"))
        .withColumn("__svv", lit(1L).cast("decimal(38,0)"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      ChangePoint.dickeyFullerFromSums(sums(10L), "s").collect()
    }
    assert(msgs(e).exists(_.contains("dickeyFullerFromSums")),
      s"expected the loud overflow raise, got: $e")
    // ineligible series: same overflowing sums, n = 2 — must DROP,
    // not raise (the guard's when() now requires n >= 4 itself)
    assert(ChangePoint.dickeyFullerFromSums(sums(2L), "s").count() === 0L)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }
}
