package graft.operators

import graft.SparkSuite

class PhraseSearchSpec extends SparkSuite {

  import spark.implicits._

  private def docs = Seq(
    (1L, Seq("x", "y", "the", "quick", "fox", "z")),      // query doc
    (2L, Seq("the", "quick", "fox", "jumps")),            // 1 match
    (3L, Seq("a", "the", "quick", "fox", "the", "quick", "fox")), // 2
    (4L, Seq("quick", "the", "fox")),                     // scrambled: 0
    (5L, Seq("the", "quick")),                            // truncated: 0
    (6L, Seq("a", "b", "a", "b", "a"))                    // overlap corpus
  ).toDF("doc_id", "tokens")

  test("finds exact consecutive phrases, counts multiple occurrences") {
    val idx = PhraseSearch.positionalPostings(docs, "doc_id", "tokens")
    val phrases = PhraseSearch.phrasesFromTokens(
      docs.filter($"doc_id" === 1L), "doc_id", "tokens", 3, 3)
    // phrase = tokens 3..5 of doc 1 = (the, quick, fox)
    val out = PhraseSearch.phraseMatches(idx, phrases, 3)
      .orderBy("query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("overlapping occurrences with repeated terms all count") {
    val idx = PhraseSearch.positionalPostings(docs, "doc_id", "tokens")
    val phrases = Seq(
      (9L, 0, "a"), (9L, 1, "b"), (9L, 2, "a")
    ).toDF("query_id", "off", "term")
    val out = PhraseSearch.phraseMatches(idx, phrases, 3).collect()
    // doc 6 = a b a b a: "a b a" occurs at starts 1 and 3
    assert(out.length === 1)
    assert(out.head.getLong(1) === 6L && out.head.getLong(2) === 2L)
  }

  test("query doc excluded from its own results; short docs no phrase") {
    val idx = PhraseSearch.positionalPostings(docs, "doc_id", "tokens")
    val phrases = PhraseSearch.phrasesFromTokens(
      docs, "doc_id", "tokens", 3, 3)
    // doc 5 (2 tokens) supplies no phrase at all
    assert(phrases.filter($"query_id" === 5L).count() === 0)
    val out = PhraseSearch.phraseMatches(idx, phrases, 3)
    assert(out.filter($"query_id" === $"doc_id").count() === 0)
  }
}
