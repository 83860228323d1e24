package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Poisson-bootstrap invariants: the interval brackets the point
  * estimate and tightens as 1/√n, weights average ≈ 1 (resample size
  * ≈ n), and the whole thing is partitioning-independent.
  */
class BootstrapSpec extends SparkSuite {
  import spark.implicits._

  private def flags(n: Int, rate: Double) =
    (0 until n).map(i => (i.toLong, i < (n * rate).toInt))
      .toDF("id", "ok")

  test("CI brackets the true rate and orders p025 ≤ p500 ≤ p975") {
    val out = Bootstrap.rateCI(flags(2000, 0.3), "id", col("ok"), b = 200)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val (lo, med, hi) =
      (out("p025")._2, out("p500")._2, out("p975")._2)
    assert(lo <= med && med <= hi)
    assert(lo < 0.3 && 0.3 < hi, s"[$lo, $hi] should bracket 0.3")
    // Poisson(1) weights: resample size within 10% of n
    assert(math.abs(out("p500")._1 - 2000L) < 200,
      s"n_eff ${out("p500")._1}")
    // binomial se at n=2000 is ~0.0102; the 95% CI half-width should
    // be within a factor 2 of 2se
    assert(hi - lo < 0.082 && hi - lo > 0.01, s"width ${hi - lo}")
  }

  test("partitioning-independent") {
    val df = flags(500, 0.5)
    val a = Bootstrap.rateCI(df, "id", col("ok"), 80)
      .orderBy("stat").collect().toSeq
    val b = Bootstrap.rateCI(df.repartition(7), "id", col("ok"), 80)
      .orderBy("stat").collect().toSeq
    assert(a === b)
  }
}
