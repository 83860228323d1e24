package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Randomized cross-checks of the round-12 rank statistics against
  * independent brute-force references: eight SEEDED datasets per
  * operator (heavy ties by construction — values draw from a 16-wide
  * lattice) run as ONE Spark job with the seed as the group key, and
  * every exact integer sufficient statistic must equal the reference
  * computed by direct enumeration. This is the net under the
  * hand-pinned fixtures: any lattice slip (midrank doubling, tie
  * terms, continuity corrections) surfaces on the first seed that
  * hits it.
  */
class Round12ReferenceSpec extends SparkSuite {
  import spark.implicits._

  private def seeds = 1 to 8

  /** doubled average rank of value v within multiset xs */
  private def r2(xs: Seq[Long], v: Long): Long =
    2L * (xs.count(_ < v) + 1) + xs.count(_ == v) - 1

  test("wilcoxonSignedRank equals the brute-force doubled-rank " +
      "reference on 8 seeded tie-heavy datasets") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(s)
      (1 to 30).map(_ => (s"g$s", rng.nextInt(16).toLong,
        rng.nextInt(16).toLong))
    }
    val out = NonParametric.wilcoxonSignedRank(
        data.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    seeds.foreach { s =>
      val ds = data.filter(_._1 == s"g$s")
        .map { case (_, x, y) => y - x }.filter(_ != 0L)
      val abs = ds.map(math.abs)
      val n = ds.size.toLong
      val w2 = ds.filter(_ > 0).map(d => r2(abs, math.abs(d))).sum
      val tie = abs.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * t * t - t }).sum
      val varNum = 2 * n * (n + 1) * (2 * n + 1) - tie
      if (varNum > 0)
        assert(out(s"g$s") === ((n, w2, n * (n + 1) / 2, varNum)),
          s"seed $s")
    }
  }

  test("cramerVonMises u4 equals direct enumeration on 8 seeded " +
      "tie-heavy datasets") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(100 + s)
      (1 to 25).map(_ => (s"g$s", rng.nextBoolean(),
        rng.nextInt(12).toLong))
    }
    val out = DistributionTests.cramerVonMises(
        data.toDF("g", "b", "x"), "g", col("b"), "x")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    seeds.foreach { s =>
      val rows = data.filter(_._1 == s"g$s")
      val pooled = rows.map(_._3)
      def cohortSum(b: Boolean): Long = {
        val xs = rows.filter(_._2 == b).map(_._3).sorted
        xs.zipWithIndex.map { case (v, i) =>
          val d = r2(pooled, v) - 2L * (i + 1); d * d
        }.sum
      }
      val m = rows.count(!_._2).toLong
      val nn = rows.count(_._2).toLong
      if (m > 0 && nn > 0)
        assert(out(s"g$s") === m * cohortSum(false) + nn * cohortSum(true),
          s"seed $s")
    }
  }

  test("brunnerMunzel p_ppm equals the pair-enumeration " +
      "stochastic-superiority estimate on 8 seeded datasets") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(200 + s)
      (1 to 30).map(_ => (s"g$s", rng.nextBoolean(),
        rng.nextInt(10).toLong))
    }
    val out = NonParametric.brunnerMunzel(
        data.toDF("g", "b", "x"), "g", col("b"), "x")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    seeds.foreach { s =>
      val rows = data.filter(_._1 == s"g$s")
      val as = rows.filter(!_._2).map(_._3)
      val bs = rows.filter(_._2).map(_._3)
      if (as.size >= 2 && bs.size >= 2 && out.contains(s"g$s")) {
        val lt = (for (a <- as; b <- bs if a < b) yield 1L).sum
        val eq = (for (a <- as; b <- bs if a == b) yield 1L).sum
        val ppm = (2 * lt + eq) * 1000000L / (2L * as.size * bs.size)
        assert(out(s"g$s") === ppm, s"seed $s")
      }
    }
  }

  test("hodgesLehmannShift equals the sorted-pairwise-difference " +
      "doubled median on 8 seeded datasets") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(300 + s)
      (1 to 20).map(_ => (s"g$s", rng.nextBoolean(),
        rng.nextInt(20).toLong))
    }
    val out = NonParametric.hodgesLehmannShift(
        data.toDF("g", "t", "x"), "g", col("t"), "x")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    seeds.foreach { s =>
      val rows = data.filter(_._1 == s"g$s")
      val cs = rows.filter(!_._2).map(_._3)
      val ts = rows.filter(_._2).map(_._3)
      if (cs.nonEmpty && ts.nonEmpty) {
        val diffs = (for (t <- ts; c <- cs) yield t - c).sorted
        val p = diffs.size
        val lo = diffs((p + 1) / 2 - 1)
        val hi = diffs(p / 2)
        assert(out(s"g$s") === lo + hi, s"seed $s")
      }
    }
  }

  test("moodMedian's lower median pin and above-counts equal direct " +
      "enumeration on 8 seeded datasets") {
    val data = seeds.flatMap { s =>
      val rng = new scala.util.Random(400 + s)
      (1 to 40).map(i => (s"g$s", s"t${i % 3}", rng.nextInt(9).toLong))
    }
    val out = NonParametric.moodMedian(
        data.toDF("p", "g", "x"), "p", "g", "x")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    seeds.foreach { s =>
      val xs = data.filter(_._1 == s"g$s").map(_._3)
      val sorted = xs.sorted
      val med = sorted((xs.size + 1) / 2 - 1)
      val above = xs.count(_ > med).toLong
      if (above > 0 && above < xs.size)
        assert(out(s"g$s") === above, s"seed $s (median $med)")
    }
  }
}
