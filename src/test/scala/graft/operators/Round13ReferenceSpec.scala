package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Randomized cross-checks of the round-13 statistics against
  * independent brute-force references (the Round12ReferenceSpec
  * net): eight SEEDED tie-heavy datasets per operator run as ONE
  * Spark job with the seed as the group key, compared against
  * references computed by a DIFFERENT characterization wherever one
  * exists — Wasserstein via the quantile-coupling expansion (not
  * the ECDF-area walk the operator uses), AUC via O(n²) pair
  * enumeration (not midranks), Kuiper via a direct merged-order
  * scan. Any lattice slip surfaces on the first seed that hits it.
  */
class Round13ReferenceSpec extends SparkSuite {
  import spark.implicits._

  private def seeds = 1 to 8

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("kuiper V equals a direct merged-order scan on 8 seeded " +
      "tie-heavy datasets") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(s)
      (1 to 40).map(i => (s"g$s", rng.nextBoolean(),
        rng.nextInt(10).toLong, i.toLong))
    }
    val out = DistributionTests.kuiperTwoSample(
        data.toDF("g", "b", "v", "tie"), "g", col("b"), "v", "tie")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    seeds.foreach { s =>
      val rows = data.filter(_._1 == s"g$s")
        .sortBy(t => (t._3, t._4))
      val na = rows.count(!_._2).toLong
      val nb = rows.count(_._2).toLong
      var ca = 0L; var cb = 0L; var dp = 0L; var dn = 0L
      rows.foreach { r =>
        if (r._2) cb += 1 else ca += 1
        dp = math.max(dp, ca * nb - cb * na)
        dn = math.max(dn, cb * na - ca * nb)
      }
      assert(out(s"g$s") === round6((dp + dn).toDouble / (na * nb)),
        s"seed $s")
    }
  }

  test("wasserstein equals the quantile-coupling expansion " +
      "(a different characterization) on 8 seeded datasets") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(40 + s)
      (1 to 15).map(_ => (s"g$s", false, rng.nextInt(20).toLong)) ++
        (1 to 12).map(_ => (s"g$s", true, rng.nextInt(20).toLong))
    }
    val out = DistributionTests.wasserstein(
        data.toDF("g", "b", "x"), "g", col("b"), "x")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    seeds.foreach { s =>
      val as = data.filter(t => t._1 == s"g$s" && !t._2).map(_._3)
      val bs = data.filter(t => t._1 == s"g$s" && t._2).map(_._3)
      // expand each sample to the common na·nb grid and couple the
      // order statistics: W1 = Σ|a_(i) − b_(i)| / (na·nb)
      val ea = as.sorted.flatMap(v => Seq.fill(bs.size)(v))
      val eb = bs.sorted.flatMap(v => Seq.fill(as.size)(v))
      val num = ea.zip(eb).map { case (a, b) => math.abs(a - b) }.sum
      val exp = math.round(
        num.toDouble / (as.size.toLong * bs.size) * 1e6)
      assert(out(s"g$s") === exp, s"seed $s: ${out(s"g$s")} vs $exp")
    }
  }

  test("auc equals O(n^2) pair enumeration on 8 seeded tie-heavy " +
      "datasets") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(80 + s)
      (1 to 30).map(_ => (s"g$s", rng.nextBoolean(),
        rng.nextInt(8).toLong))
    }
    val out = Calibration.auc(
        data.toDF("g", "y", "x"), "g", col("y"), "x")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    seeds.foreach { s =>
      val pos = data.filter(t => t._1 == s"g$s" && t._2).map(_._3)
      val neg = data.filter(t => t._1 == s"g$s" && !t._2).map(_._3)
      if (pos.nonEmpty && neg.nonEmpty) {
        val wins2 = (for (p <- pos; n <- neg) yield
          if (p > n) 2L else if (p == n) 1L else 0L).sum
        val exp = math.round(wins2.toDouble /
          (2.0 * pos.size * neg.size) * 1e6)
        assert(out(s"g$s") === exp, s"seed $s: ${out(s"g$s")} vs $exp")
      }
    }
  }

  test("gTest matches the direct log-likelihood formula on 8 " +
      "seeded contingency tables") {
    seeds.foreach { s =>
      val rng = new scala.util.Random(120 + s)
      val data = (1 to 200).map(_ =>
        (s"r${rng.nextInt(3)}", rng.nextInt(4).toLong))
      val g = DistributionTests.gTest(
          data.toDF("a", "b"), "a", "b", crit4 = 38415L)
        .collect().head
      val n = data.size.toDouble
      val cells = data.groupBy(identity).view.mapValues(_.size).toMap
      val rt = data.groupBy(_._1).view.mapValues(_.size).toMap
      val ct = data.groupBy(_._2).view.mapValues(_.size).toMap
      val ref = 2.0 * cells.map { case ((a, b), o) =>
        o * math.log(o * n / (rt(a).toDouble * ct(b))) }.sum
      assert(math.abs(g.getDouble(4) - ref) < 1e-5,
        s"seed $s: ${g.getDouble(4)} vs $ref")
    }
  }

  test("cmh matches the direct hypergeometric formula on 8 seeded " +
      "stratified tables") {
    seeds.foreach { s =>
      val rng = new scala.util.Random(160 + s)
      val data = (1 to 300).map(_ => (s"st${rng.nextInt(4)}",
        rng.nextBoolean(), rng.nextInt(3) == 0))
      val out = AbTest.cmh(
          data.toDF("s", "b", "y"), "s", col("b"), col("y"))
        .collect().head
      val ref = {
        var o = 0.0; var e = 0.0; var v = 0.0
        data.groupBy(_._1).values.foreach { rows =>
          val n = rows.size.toDouble
          val n1 = rows.count(_._2).toDouble
          val m1 = rows.count(_._3).toDouble
          o += rows.count(r => r._2 && r._3)
          e += n1 * m1 / n
          v += n1 * (n - n1) * m1 * (n - m1) / (n * n * (n - 1.0))
        }
        (o - e) * (o - e) / v
      }
      assert(math.abs(out.getLong(4) / 1e6 - ref) < 1e-4,
        s"seed $s: ${out.getLong(4)} vs $ref")
    }
  }

  test("ljungBox matches the direct portmanteau formula on 8 seeded " +
      "series") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(200 + s)
      (1 to 25).map(i => (s"g$s", i.toLong, rng.nextInt(30).toLong))
    }
    val out = ChangePoint.ljungBox(
        data.toDF("g", "i", "x"), "g", "i", "x", maxLag = 3,
        crit4 = 78147L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    seeds.foreach { s =>
      val xs = data.filter(_._1 == s"g$s").sortBy(_._2)
        .map(_._3.toDouble)
      val n = xs.size
      val m = xs.sum / n
      val d0 = xs.map(v => (v - m) * (v - m)).sum
      val q = n * (n + 2.0) * (1 to 3).map { l =>
        val r = (0 until n - l)
          .map(t => (xs(t) - m) * (xs(t + l) - m)).sum / d0
        r * r / (n - l)
      }.sum
      assert(math.abs(out(s"g$s") - q) < 1e-4,
        s"seed $s: ${out(s"g$s")} vs $q")
    }
  }

  test("durbinWatson equals the exact rational on 8 seeded series") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(240 + s)
      (1 to 20).map(i => (s"g$s", i.toLong, rng.nextInt(25).toLong))
    }
    val out = ChangePoint.durbinWatson(
        data.toDF("g", "i", "x"), "g", "i", "x")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    seeds.foreach { s =>
      val xs = data.filter(_._1 == s"g$s").sortBy(_._2).map(_._3)
      val n = xs.size.toLong
      val sdd = xs.sliding(2).map { case Seq(a, b) =>
        (b - a) * (b - a) }.sum
      val den = n * xs.map(v => v * v).sum - xs.sum * xs.sum
      assert(out(s"g$s") ===
        round6(n.toDouble * sdd / den.toDouble), s"seed $s")
    }
  }
}
