package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Seq("spark", "runs", "fast")),
    (2L, Seq("spark", "spark", "shuffles", "data")),
    (3L, Seq("ducks", "swim", "fast")),
    (4L, Seq("data", "ducks", "and", "more", "data", "and", "words",
      "and", "padding", "tokens"))
  ).toDF("doc_id", "tokens")

  test("postings carry tf, dl and df") {
    val p = Bm25.postings(corpus, "doc_id", "tokens")
      .orderBy("term", "doc_id").collect()
    val sparkRows = p.filter(_.getString(0) == "spark")
    assert(sparkRows.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 1L), (2L, 2L)))          // tf per doc
    assert(sparkRows.forall(_.getLong(4) == 2L)) // df = 2 docs
    assert(p.filter(_.getString(0) == "padding").head.getInt(3) === 10) // dl
  }

  test("scoring prefers higher-tf and rarer terms, excludes self") {
    val qt = Seq((1L, "spark"), (1L, "fast")).toDF("query_id", "term")
    val out = Bm25.scoreTopK(
        Bm25.postings(corpus, "doc_id", "tokens"),
        Bm25.totals(corpus, "doc_id", "tokens"), qt, k = 10)
      .orderBy("rank").collect()
    // doc 1 (the query) is excluded; docs 2 (spark×2) and 3 (fast)
    // both match one query term.
    assert(!out.map(_.getLong(1)).contains(1L))
    assert(out.map(_.getLong(1)).toSet === Set(2L, 3L))
    // spark and fast have equal df=2; doc 2's double tf beats doc 3's
    // single tf despite doc 2 being longer.
    assert(out.head.getLong(1) === 2L)
    assert(out.head.getLong(2) > out.last.getLong(2))
  }

  test("a query term absent from the corpus contributes nothing") {
    val qt = Seq((9L, "zzz-not-a-term"), (9L, "ducks"))
      .toDF("query_id", "term")
    val out = Bm25.scoreTopK(
        Bm25.postings(corpus, "doc_id", "tokens"),
        Bm25.totals(corpus, "doc_id", "tokens"), qt, k = 10)
      .collect()
    assert(out.map(_.getLong(1)).toSet === Set(3L, 4L)) // ducks docs only
  }

  test("duplicate-free query terms: rank order is (score desc, doc asc)") {
    val qt = Seq((9L, "data")).toDF("query_id", "term")
    val out = Bm25.scoreTopK(
        Bm25.postings(corpus, "doc_id", "tokens"),
        Bm25.totals(corpus, "doc_id", "tokens"), qt, k = 10)
      .orderBy("rank").collect()
    // data: doc 4 tf=2 (long doc), doc 2 tf=1 (short doc). Verify the
    // emitted rank matches the score order with doc tie-break.
    val scores = out.map(r => (r.getLong(2), r.getLong(1)))
    assert(scores === scores.sortBy { case (s, d) => (-s, d) })
  }

  test("plan shape: query terms broadcast, no cartesian product") {
    val qt = Seq((1L, "spark")).toDF("query_id", "term")
    val plan = Bm25.scoreTopK(
      Bm25.postings(corpus, "doc_id", "tokens"),
      Bm25.totals(corpus, "doc_id", "tokens"), qt, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
