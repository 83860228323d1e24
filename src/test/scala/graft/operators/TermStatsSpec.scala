package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** Hand-checked burstiness and negative-sampling values. */
class TermStatsSpec extends SparkSuite {
  import spark.implicits._

  test("burstiness: clumped term gets Fano > 0, uniform term 0") {
    // "x": tf per doc = 3,1,1,1,2 → mean 1.6, var 0.8, fano 0.5
    // "u": tf = 2,2,2,2,2 → var 0, fano 0
    val rows =
      (1L to 5L).flatMap(d => Seq.fill(2)((d, "u"))) ++
        Seq.fill(3)((1L, "x")) ++ Seq((2L, "x"), (3L, "x"), (4L, "x")) ++
        Seq.fill(2)((5L, "x"))
    val out = TermStats.burstiness(rows.toDF("doc_id", "term"),
        "doc_id", "term", minDf = 5)
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("u", 5L, 10L, 2.0, 0.0),
      ("x", 5L, 8L, 1.6, 0.5)))
  }

  test("burstiness enforces the df floor") {
    val rows = Seq((1L, "rare"), (2L, "rare"))
    assert(TermStats.burstiness(rows.toDF("doc_id", "term"),
      "doc_id", "term", minDf = 5).count() === 0)
  }

  test("negative sampling: 16:1 counts give 8:1 weights (x^0.75)") {
    val rows = Seq.fill(16)("a") ++ Seq("b")
    val out = TermStats.negativeSamplingTable(rows.toDF("term"), "term")
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 16^0.75 = 8 → weights 8e6 and 1e6, shares floor(8/9), floor(1/9)
    assert(out.toSeq === Seq(
      ("a", 16L, 8000000L, 888888L),
      ("b", 1L, 1000000L, 111111L)))
  }

  test("simpson: uniform tokens max diversity, single token zero") {
    // g1: 4 distinct tokens once each → coll 0 → 1e6
    // g2: one token 4 times → coll 12, n(n-1) 12 → 0
    val rows = Seq(("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "d")) ++
      Seq.fill(4)(("g2", "same"))
    val out = TermStats.simpsonDiversity(rows.toDF("grp", "term"),
        "grp", "term")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("g1", 4L, 4L, 1000000L),
      ("g2", 4L, 1L, 0L)))
  }

  test("entityCounts sees what redactPii scrubs") {
    val (em, ip, ph) = graft.functions.Redaction.entityCounts(col("t"))
    val r = Seq("mail a@b.co and c@d.org via 10.0.0.7 call +1 555 0100 99")
      .toDF("t")
      .select(em.as("e"), ip.as("i"), ph.as("p"))
      .collect().head
    assert(r.getInt(0) === 2 && r.getInt(1) === 1 && r.getInt(2) === 1)
  }
}
