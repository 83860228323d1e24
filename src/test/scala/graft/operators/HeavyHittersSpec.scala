package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Misra-Gries + exact-recount frequent items: equality with the
  * naive full aggregation under arbitrary partitioning (the MG
  * candidate union must be a superset, the recount must remove every
  * false positive), and the exact-decimal threshold edge.
  */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, support: Double) = {
    val n = df.count()
    val thr = (BigDecimal(support.toString) * BigDecimal(n))
      .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
    df.groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
      .orderBy(desc("cnt"), asc("item"))
      .as[(String, Long)].collect().toSeq
  }

  test("matches the full aggregation on skewed data, any partitioning") {
    // Zipf-ish: item i appears ~1000/i times, plus long-tail noise
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"hot$i")) ++
      (0 until 5000).map(j => s"tail$j")
    val expected = naive(rows.toDF("item"), 0.01)
    assert(expected.nonEmpty && expected.size < 40) // non-vacuous
    for (parts <- Seq(1, 7, 32)) {
      val df = scala.util.Random.shuffle(rows).toDF("item")
        .repartition(parts)
      val got = HeavyHitters.frequentItems(df, "item", 0.01)
        .as[(String, Long)].collect().toSeq
      assert(got == expected, s"mismatch at $parts partitions")
    }
  }

  test("borderline item spread thin across partitions is still found") {
    // "edge" has exactly the threshold count but never dominates any
    // single partition — the superset guarantee must still catch it
    val support = 0.05
    val noise = (0 until 190).map(j => s"n$j")
    val rows = Seq.fill(10)("edge") ++ noise // n=200, thr=10
    val df = rows.zipWithIndex.toDF("item", "i")
      .repartition(10, col("i")).drop("i")
    val got = HeavyHitters.frequentItems(df, "item", support)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("edge", 10L)))
  }

  test("threshold uses exact decimal, not double (0.35 * 20 edge)") {
    // double 0.35*20 = 7.000000000000001 → ceil 8 would wrongly
    // exclude a count-7 item; exact decimal gives ceil(7.00) = 7
    val rows = Seq.fill(7)("seven") ++ (0 until 13).map(j => s"x$j")
    val got = HeavyHitters
      .frequentItems(rows.toDF("item"), "item", 0.35)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("seven", 7L)))
  }
}
