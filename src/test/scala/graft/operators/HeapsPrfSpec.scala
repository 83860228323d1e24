package graft.operators

import graft.SparkSuite

/** Hand-checked Heaps' fits and the PRF expansion loop. */
class HeapsPrfSpec extends SparkSuite {
  import spark.implicits._

  test("heaps: all-unique tokens grow vocab linearly (beta = 1)") {
    val tokens = (1L to 5L).flatMap(d =>
      (1 to 4).map(i => (d, s"w${d}_$i"))).toDF("doc_id", "term")
    val r = ZipfFit.heaps(tokens, "doc_id", "term").collect().head
    assert(r.getLong(0) === 5L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-5, s"beta ${r.getDouble(1)}")
    assert(r.getDouble(3) > 0.999999)
  }

  test("heaps: a single repeated token has beta = 0") {
    val tokens = (1L to 4L).flatMap(d =>
      Seq.fill(3)((d, "same"))).toDF("doc_id", "term")
    val r = ZipfFit.heaps(tokens, "doc_id", "term").collect().head
    assert(r.getDouble(1) === 0.0)
  }

  test("PRF expansion surfaces docs the raw query cannot reach") {
    val docs = Seq(
      (97L, Seq("t", "x")),      // the query doc (excluded from results)
      (1L, Seq("t", "c", "c")),  // has query term + strong co-term
      (2L, Seq("c", "c", "z")),  // only the co-term
      (3L, Seq("y", "y", "w"))   // unrelated
    ).toDF("doc_id", "tokens")
    val index = Bm25.postings(docs, "doc_id", "tokens")
    val totals = Bm25.totals(docs, "doc_id", "tokens")
    val q0 = Seq((97L, "t")).toDF("query_id", "term")

    val first = Bm25.scoreTopK(index, totals, q0, 10)
      .collect().map(_.getLong(1)).toSet
    assert(first === Set(1L), "raw query reaches only the t-doc")

    val q2 = Bm25.prfExpandTerms(index, totals, q0, m = 1, e = 1)
    val terms = q2.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(terms === Set((97L, "t"), (97L, "c")),
      s"expansion should add exactly the co-term: $terms")

    val second = Bm25.scoreTopK(index, totals, q2, 10)
      .collect().map(_.getLong(1)).toSet
    assert(second === Set(1L, 2L),
      "expanded query must surface the co-term-only doc")
  }
}
