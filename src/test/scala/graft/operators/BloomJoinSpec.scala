package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bloom prefilter soundness: never drops a true match (the join
  * result is exactly the plain join), reduces the probe volume on a
  * selective build side, and an empty build side yields an empty
  * result rather than a crash (the stat.bloomFilter NPE trap).
  */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val probe = (0L until 5000L)
    .map(i => (i % 1000, s"p$i")).toDF("k", "pv")
  private lazy val build = (0L until 1000L).filter(_ % 50 == 0)
    .map(k => (k, s"b$k")).toDF("k", "bv")

  test("prefiltered join equals the plain join") {
    val got = BloomJoin.innerPrefiltered(probe, build, "k", 100)
      .orderBy("k", "pv").collect().map(_.toSeq).toSeq
    val want = probe.join(build, Seq("k"))
      .orderBy("k", "pv").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("prefilter keeps a superset of matches and drops most others") {
    val kept = BloomJoin.prefilter(probe, build, "k", 100)
    val matchKeys = build.select("k").as[Long].collect().toSet
    val keptKeys = kept.select("k").as[Long].collect()
    // superset: every true match survives
    assert(probe.filter($"k".isin(matchKeys.toSeq: _*)).count()
      == keptKeys.count(matchKeys))
    // reduction: 2% true selectivity + 1% fpp → far under half kept
    assert(kept.count() < probe.count() / 2)
  }

  test("empty build side gives the empty join, not an NPE") {
    assert(BloomJoin.innerPrefiltered(
      probe, build.filter(lit(false)), "k", 100).count() == 0L)
    assert(BloomJoin.prefilter(
      probe, build.filter(lit(false)), "k", 100).count() == 0L)
  }
}
