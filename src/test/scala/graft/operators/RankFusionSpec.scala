package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RankFusionSpec extends SparkSuite {
  import spark.implicits._

  test("rrf sums lattice contributions across lists") {
    val la = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val lb = Seq((1L, 10L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val out = RankFusion.reciprocalRankFusion(Seq(la, lb), topK = 10)
      .orderBy("rank").collect()
    val r1 = math.round(1e9 / 61.0) // rank-1 contribution
    val r2 = math.round(1e9 / 62.0)
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq(
      (10L, 2 * r1), (20L, r2), (30L, r2)))
    // 20 vs 30 tie on score → doc_id ascending
    assert(out.map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2, 3))
  }

  test("single-list fusion preserves the input order") {
    val la = Seq((7L, 3L, 1), (7L, 9L, 2), (7L, 5L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = RankFusion.reciprocalRankFusion(Seq(la), topK = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 9L))
  }
}
