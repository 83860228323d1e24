package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CmsSketchSpec extends SparkSuite {

  import spark.implicits._

  private def items =
    (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(5)("gamma") ++ (1 to 200).map(i => s"tail$i"))
      .toDF("term")

  test("estimates never undercount and are exact-or-close here") {
    val counters = CmsSketch.buildCounters(items, "term")
    val probes = Seq("alpha", "beta", "gamma", "tail1", "absent")
      .toDF("term")
    val est = CmsSketch.estimate(counters, probes, "term")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 5L,
      "tail1" -> 1L, "absent" -> 0L)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t undercounted: ${est(t)} < $c")
      // 275 items in 1024 buckets: collisions possible but bounded
      assert(est(t) <= c + 10, s"$t overcount implausible: ${est(t)}")
    }
  }

  test("counter tables merge by summing on (j, bucket)") {
    val a = items.limit(100)
    val b = items.exceptAll(a)
    val merged = CmsSketch.buildCounters(a, "term")
      .unionByName(CmsSketch.buildCounters(b, "term"))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val whole = CmsSketch.buildCounters(items, "term")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("counter table is bounded by depth x width") {
    val n = CmsSketch.buildCounters(items, "term").count()
    assert(n <= CmsSketch.Depth.toLong * CmsSketch.Width)
    // every row contributes to exactly Depth counters
    val total = CmsSketch.buildCounters(items, "term")
      .agg(sum("cnt")).as[Long].head()
    assert(total === items.count() * CmsSketch.Depth)
  }
}
