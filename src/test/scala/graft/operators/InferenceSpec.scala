package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-checked Welch t / Cramér's V / Spearman values. */
class InferenceSpec extends SparkSuite {
  import spark.implicits._

  test("Welch t on {1,3} vs {5,9}: t = -5/√5, df = 25/17") {
    // A: mean 2, var 2, s_a = 1; B: mean 7, var 8, s_b = 4
    // t = (2-7)/√5 = -2.236068, df = 25/(1 + 16) = 1.470588
    val df = Seq(("g", false, 1L), ("g", false, 3L),
      ("g", true, 5L), ("g", true, 9L)).toDF("grp", "b", "x")
    val r = DistributionTests.welchT(df, "grp", col("b"), "x")
      .collect().head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === 2.0 && r.getDouble(4) === 7.0)
    assert(math.abs(r.getDouble(5) - -2.236068) < 1e-6)
    assert(math.abs(r.getDouble(6) - 1.470588) < 1e-6)
  }

  test("Welch t drops groups with a degenerate cohort") {
    val df = Seq(("g", false, 1L), ("g", true, 5L), ("g", true, 9L))
      .toDF("grp", "b", "x")
    assert(DistributionTests.welchT(df, "grp", col("b"), "x").count() === 0)
  }

  test("Cramér's V: perfect association = 1, independence = 0") {
    val perfect = (Seq.fill(10)(("A", "x")) ++ Seq.fill(10)(("B", "y")))
      .toDF("a", "b")
    val p = DistributionTests.cramersV(perfect, "a", "b").collect().head
    // chi2 = n = 20 for a perfect 2x2
    assert(p.getDouble(3) === 20.0)
    assert(p.getDouble(4) === 1.0)
    val indep = (for {
      a <- Seq("A", "B"); b <- Seq("x", "y"); _ <- 1 to 5
    } yield (a, b)).toDF("a", "b")
    val i = DistributionTests.cramersV(indep, "a", "b").collect().head
    assert(i.getDouble(3) === 0.0 && i.getDouble(4) === 0.0)
  }

  test("Spearman: monotone = 1, reversed ties = -1, permutation -0.5") {
    val mono = Seq(("m", 1L, 1L), ("m", 2L, 4L), ("m", 3L, 9L),
      ("m", 4L, 16L), ("m", 5L, 25L)).toDF("grp", "x", "y")
    assert(RankCorrelation.spearman(mono, "grp", "x", "y")
      .collect().head.getDouble(2) === 1.0)
    // ties: x=(1,1,2) vs y=(10,10,3) — doubled ranks (3,3,6)/(5,5,2)
    val tied = Seq(("t", 1L, 10L), ("t", 1L, 10L), ("t", 2L, 3L))
      .toDF("grp", "x", "y")
    assert(RankCorrelation.spearman(tied, "grp", "x", "y")
      .collect().head.getDouble(2) === -1.0)
    // classic: ranks y = (3,1,2) of x = (1,2,3): 1 - 6·6/24 = -0.5
    val perm = Seq(("p", 1L, 3L), ("p", 2L, 1L), ("p", 3L, 2L))
      .toDF("grp", "x", "y")
    assert(RankCorrelation.spearman(perm, "grp", "x", "y")
      .collect().head.getDouble(2) === -0.5)
  }

  test("Spearman drops constant-variable groups") {
    val const = Seq(("c", 1L, 1L), ("c", 1L, 2L), ("c", 1L, 3L))
      .toDF("grp", "x", "y")
    assert(RankCorrelation.spearman(const, "grp", "x", "y").count() === 0)
  }

  test("Kendall tau-b: ±1 on monotone data, hand-computed tie case") {
    val mono = Seq(("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),
      ("dn", 1L, 9L), ("dn", 2L, 5L), ("dn", 3L, 1L))
      .toDF("grp", "x", "y")
    val out = RankCorrelation.kendallTauB(mono, "grp", "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out("up") === 1.0 && out("dn") === -1.0)
    // x=(1,2,2,3), y=(4,3,2,1): the x-tied pair (2,3)-(2,2) counts
    // for neither side; every other pair is discordant → C=0, D=5,
    // tiex=1, tiey=0, tau_b = -5/sqrt((6-1)(6-0)) = -5/sqrt(30)
    val tied = Seq(("t", 1L, 4L), ("t", 2L, 3L), ("t", 2L, 2L),
      ("t", 3L, 1L)).toDF("grp", "x", "y")
    val r = RankCorrelation.kendallTauB(tied, "grp", "x", "y")
      .collect().head
    assert((r.getLong(2), r.getLong(3)) === ((0L, 5L)))
    assert(r.getDouble(4) ===
      BigDecimal(-5.0 / math.sqrt(30.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("Kendall refuses unbounded strata; all-tied groups drop; " +
      "fractional input rejected") {
    val df = (1L to 20L).map(i => ("g", i, i * 2)).toDF("grp", "x", "y")
    val e = intercept[IllegalArgumentException] {
      RankCorrelation.kendallTauB(df, "grp", "x", "y",
        maxGroupRows = 10L)
    }
    assert(e.getMessage.contains("O(n^2)"))
    val allTied = Seq(("a", 1L, 5L), ("a", 1L, 6L)).toDF("grp", "x", "y")
    assert(RankCorrelation.kendallTauB(allTied, "grp", "x", "y")
      .count() === 0)
    val frac = Seq(("f", 1.5, 2.0)).toDF("grp", "x", "y")
    intercept[IllegalArgumentException] {
      RankCorrelation.kendallTauB(frac, "grp", "x", "y")
    }
  }
}
