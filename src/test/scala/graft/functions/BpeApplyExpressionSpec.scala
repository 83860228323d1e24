package graft.functions

import graft.SparkSuite
import graft.operators.BpeTokenizer
import org.apache.spark.sql.functions._

/** [[BpeApplyMerges]] must reproduce the rank-by-rank greedy fold
  * ([[BpeTokenizer.segmentFold]], one aggregate HOF per merge) on
  * EVERY (corpus, merge list) — including the alias chains where a
  * plain lowest-rank-first heap diverges, and the identical-symbol
  * runs where left-to-right order matters. The kernel's whole point
  * is per-word cost independent of vocabulary size; its correctness
  * bar is bit-equality with the fold.
  */
class BpeApplyExpressionSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(texts: Seq[String]) = texts.toDF("text")

  private def assertSame(
      texts: Seq[String], merges: Seq[(String, String)]): Unit = {
    val df = corpus(texts)
    val native = BpeTokenizer.segment(df, "text", merges)
      .select(col("word"), col("freq"),
        array_join(col("pieces"), "|").as("p"))
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    val fold = BpeTokenizer.segmentFold(df, "text", merges)
      .select(col("word"), col("freq"),
        array_join(col("pieces"), "|").as("p"))
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    assert(native === fold,
      s"kernel diverged from the fold on merges=$merges corpus=$texts")
  }

  test("trained merge list on the toy corpus") {
    val texts = Seq(
      "low low low low low",
      "lower lower newest newest newest newest",
      "widest widest widest")
    val merges = BpeTokenizer.train(corpus(texts), "text", nMerges = 8,
      minCount = 1L)
    assertSame(texts, merges)
  }

  test("identical-symbol runs stay leftmost-greedy per rank") {
    assertSame(Seq.fill(5)("aaaaaa") ++ Seq("aaa", "aaaa"),
      Seq(("a", "a"), ("aa", "aa"), ("aa", "a</w>")))
  }

  test("alias chain: a later merge creates an earlier merge's " +
      "operand — the frontier guard must NOT go back") {
    // rank 1 wants (aab, c*) but no 'aab' symbol exists yet; rank 2
    // (a,a) then rank 3 (aa,b) CREATE 'aab'. The fold's rank-1 pass
    // is long over by then; a frontier-less heap would merge the
    // new (aab, c*) pair. Word "aabc": [a, a, b, c</w>].
    assertSame(Seq("aabc", "aabc", "ab"),
      Seq(("aab", "c</w>"), ("a", "a"), ("aa", "b")))
    // and the legitimate forward direction still merges: rank order
    // (a,a) -> (aa,b) -> (aab, c</w>) collapses the word fully
    assertSame(Seq("aabc", "aabc", "ab"),
      Seq(("a", "a"), ("aa", "b"), ("aab", "c</w>")))
  }

  test("merges that never match, empty list, and 1-char words") {
    assertSame(Seq("x", "y y", "zq"), Nil)
    assertSame(Seq("x", "y y", "zq"), Seq(("q", "q"), ("zz", "top")))
  }

  test("marker-carrying merges (word-final units)") {
    assertSame(Seq("go go going gone"),
      Seq(("g", "o</w>"), ("g", "o"), ("go", "n"), ("o", "n")))
  }

  test("randomized corpus and merge-list sweep") {
    val rnd = new scala.util.Random(2026)
    for (trial <- 0 until 25) {
      val alphabet = "abc"
      val words = Seq.fill(3 + rnd.nextInt(8))(
        Seq.fill(1 + rnd.nextInt(7))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      val texts = words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w))
      // half the trials use a genuinely trained list; the other half
      // a synthetic list over random short symbols (hits never-match,
      // alias, and marker shapes the trainer avoids)
      val merges =
        if (trial % 2 == 0)
          BpeTokenizer.train(corpus(texts), "text", nMerges = 6,
            minCount = 1L)
        else {
          def s() = Seq.fill(1 + rnd.nextInt(2))(
            alphabet(rnd.nextInt(alphabet.length))).mkString +
            (if (rnd.nextInt(4) == 0) BpeTokenizer.EndOfWord else "")
          Seq.fill(6)((s(), s())).distinct
        }
      withClue(s"trial $trial corpus=$texts merges=$merges: ") {
        assertSame(texts, merges)
      }
    }
  }

  test("production-depth merge list on the documents fixture: " +
      "kernel segments with the FULL trained vocabulary and every " +
      "word round-trips byte-exactly") {
    // Train to minCount exhaustion (~93 merges on this corpus) —
    // a merge list the nested-HOF fold could only express as ~93
    // stacked aggregate expressions. The kernel takes it in one
    // call; correctness is self-validating: pieces concatenate back
    // to the word + end-of-word marker, and every piece is in the
    // trained vocabulary (base symbols or merge outputs).
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = BpeTokenizer.train(docs, "text", nMerges = 200,
      minCount = 2L)
    assert(merges.size > 50, s"expected a deep list, got ${merges.size}")
    val seg = BpeTokenizer.segment(docs, "text", merges)
      .select(col("word"), concat_ws("", col("pieces")).as("joined"),
        col("pieces"))
      .as[(String, String, Seq[String])].collect()
    assert(seg.nonEmpty)
    seg.foreach { case (word, joined, _) =>
      assert(joined === word + BpeTokenizer.EndOfWord,
        s"round-trip broke on '$word'")
    }
    val vocabSyms = BpeTokenizer.vocab(docs, "text",
        merges.zipWithIndex.map { case ((l, r), i) => (i + 1, l, r, 0L) })
      .select(col("symbol")).as[String].collect().toSet
    val pieceSet = seg.iterator.flatMap(_._3).toSet
    assert(pieceSet.subsetOf(vocabSyms),
      s"pieces outside the vocabulary: ${(pieceSet -- vocabSyms).take(5)}")
  }

  test("a duplicate-pair list routes to the fold path (same result " +
      "by construction)") {
    val dup = Seq(("a", "b"), ("c", "d</w>"), ("a", "b"))
    val df = corpus(Seq("abcd", "ab"))
    val viaSegment = BpeTokenizer.segment(df, "text", dup)
      .select(array_join(col("pieces"), "|")).as[String]
      .collect().sorted.toSeq
    val viaFold = BpeTokenizer.segmentFold(df, "text", dup)
      .select(array_join(col("pieces"), "|")).as[String]
      .collect().sorted.toSeq
    assert(viaSegment === viaFold)
  }
}
