package graft.operators

import graft.SparkSuite

class TrigramSearchSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "a quick brown dog"),
    (3L, "slow red fox"),
    (4L, "qu")
  ).toDF("doc_id", "text")

  test("search returns exactly the brute-force contains matches") {
    val qs = Seq((10L, "quick bro"), (11L, "fox"), (12L, "zebra"))
      .toDF("qid", "pat")
    val out = TrigramSearch.search(docs, "doc_id", "text", qs, "qid", "pat")
      .orderBy("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 3L)))
  }

  test("candidate false positives are removed by the verify step") {
    // doc 5 contains every trigram of "abcdef" (abc, bcd, cde, def)
    // without containing the pattern — it must survive the index
    // prefilter and die at verification
    val d = docs.union(Seq((5L, "abcdx cdefy bcdez")).toDF("doc_id", "text"))
    val qs = Seq((20L, "abcdef")).toDF("qid", "pat")
    assert(TrigramSearch.search(d, "doc_id", "text", qs, "qid", "pat")
      .count() === 0)
  }

  test("short patterns (<3 chars) are not served; excludeSelf drops " +
      "the query doc itself") {
    val qs = Seq((30L, "ox")).toDF("qid", "pat")
    assert(TrigramSearch.search(docs, "doc_id", "text", qs, "qid", "pat")
      .count() === 0)
    val self = Seq((1L, "quick")).toDF("qid", "pat")
    val withSelf = TrigramSearch
      .search(docs, "doc_id", "text", self, "qid", "pat")
      .collect().map(_.getLong(1)).toSet
    assert(withSelf === Set(1L, 2L))
    val noSelf = TrigramSearch
      .search(docs, "doc_id", "text", self, "qid", "pat",
        excludeSelf = true)
      .collect().map(_.getLong(1)).toSet
    assert(noSelf === Set(2L))
  }

  test("all-hot-trigram patterns are excluded under the doc-freq cap; " +
      "patterns with one cold trigram stay exact") {
    // "quick bro" in docs 1,2; trigram "qui" has df 3 (docs 1,2 and
    // a third) — cap at 2 drops hot trigrams but the pattern keeps
    // colder ones and the result is still the exact answer
    val d = docs.union(Seq((6L, "quixotic")).toDF("doc_id", "text"))
    val qs = Seq((40L, "quick bro")).toDF("qid", "pat")
    val capped = TrigramSearch
      .search(d, "doc_id", "text", qs, "qid", "pat", maxDocFreq = 2L)
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(capped === Seq(1L, 2L))
    // a pattern whose EVERY trigram is hot is not served at all
    val hot = Seq((41L, "quic")).toDF("qid", "pat")
    assert(TrigramSearch
      .search(d, "doc_id", "text", hot, "qid", "pat", maxDocFreq = 1L)
      .count() === 0)
  }

  test("search is partitioning-independent") {
    val d = (1L to 50L).map(i => (i, s"prefix${i % 7} shared middle " +
      s"suffix${i % 5}")).toDF("doc_id", "text")
    val qs = Seq((100L, "shared mid"), (101L, "prefix3")).toDF("qid", "pat")
    val a = TrigramSearch.search(d, "doc_id", "text", qs, "qid", "pat")
      .orderBy("query_id", "doc_id").collect().toSeq
    val b = TrigramSearch
      .search(d.repartition(9), "doc_id", "text", qs, "qid", "pat")
      .orderBy("query_id", "doc_id").collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
