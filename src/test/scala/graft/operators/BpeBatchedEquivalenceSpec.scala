package graft.operators

import graft.SparkSuite

/** [[BpeTokenizer.trainLedgerBatched]] must be ledger-EQUAL to the
  * sequential greedy reference ([[BpeTokenizer.trainLedgerSequential]])
  * on EVERY corpus — same steps, same (left, right) merges, same
  * selection-time counts (VERDICT r18 #1). The adversarial fixtures
  * here are the cases where naive batching (symbol-disjoint prefix
  * without the trim/self-pair/output rules) provably diverges; the
  * randomized sweep hunts anything the crafted cases miss.
  */
class BpeBatchedEquivalenceSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(texts: Seq[String]) = texts.toDF("text")

  private def assertEqual(
      texts: Seq[String], nMerges: Int, minCount: Long = 1L,
      batchSizes: Seq[Int] = Seq(2, 3, 32)): Unit = {
    val df = corpus(texts)
    val seq =
      BpeTokenizer.trainLedgerSequential(df, "text", nMerges, minCount)
    for (bs <- batchSizes) {
      val bat = BpeTokenizer.trainLedgerBatched(df, "text", nMerges,
        minCount, batchSize = bs)
      assert(bat === seq,
        s"batchSize=$bs diverged on corpus=$texts:\n  seq=$seq\n  bat=$bat")
    }
  }

  test("plain corpus: batched ledger equals sequential") {
    assertEqual(Seq(
      "low low low low low",
      "lower lower newest newest newest newest",
      "widest widest widest"), nMerges = 8)
  }

  test("run corpus: the self-pair (aa,aa) trap — merging (a,a) " +
      "creates a pair bounded by the self-pair itself, not by any " +
      "conflict") {
    // words "aaaaaaaaa"x100 give (a,a) cnt 700 and, AFTER the self
    // merge, (aa,aa) cnt 300 — which must beat "xy"x200's
    // (x,y</w>) cnt 200 at step 2. A batcher without the self-pair
    // rule accepts both (a,a) and (x,y</w>) in one round and learns
    // them in the wrong order.
    val texts =
      Seq.fill(100)("aaaaaaaaa") ++ Seq.fill(200)("xy")
    assertEqual(texts, nMerges = 6)
  }

  test("pure run corpora of varying lengths (aaaaaa and friends)") {
    assertEqual(Seq.fill(30)("aaaaaa"), nMerges = 6)
    assertEqual(Seq.fill(30)("aaaaa") ++ Seq.fill(10)("aaa"),
      nMerges = 6)
    assertEqual(Seq.fill(7)("aaaaaaaaaaaaaaaa"), nMerges = 8)
  }

  test("tie-heavy corpus: equal counts resolve identically") {
    // every pair in "abcd" appears exactly as often — order is pure
    // (left, right) lex, and the batch trim must not reorder it
    assertEqual(Seq.fill(50)("abcd") ++ Seq.fill(50)("dcba"),
      nMerges = 8)
  }

  test("chained-overlap corpus: each top pair shares a symbol with " +
      "the next (forces repeated single-merge fallback)") {
    assertEqual(
      Seq.fill(100)("abc") ++ Seq.fill(90)("bcd") ++ Seq.fill(80)("cde"),
      nMerges = 8)
  }

  test("output-aliasing across rounds: a later merge whose input IS " +
      "an earlier merge's output") {
    // round 1 learns (a,b)->ab; later candidates include (ab, c) —
    // the output-in-used check must keep (a,b) and (ab,...)-shaped
    // pairs out of the same batch
    assertEqual(
      Seq.fill(100)("abab") ++ Seq.fill(60)("abc") ++ Seq.fill(40)("xy"),
      nMerges = 8)
  }

  test("minCount early-stop agrees") {
    assertEqual(Seq.fill(5)("ab") ++ Seq("cd"), nMerges = 8,
      minCount = 3L)
    assertEqual(Seq("ab"), nMerges = 4, minCount = 2L)
  }

  test("randomized small corpora sweep") {
    val rnd = new scala.util.Random(1909)
    for (trial <- 0 until 30) {
      val alphabet = "abc"
      val nWords = 3 + rnd.nextInt(10)
      val words = Seq.fill(nWords)(
        Seq.fill(1 + rnd.nextInt(6))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      val texts = words.flatMap(w => Seq.fill(1 + rnd.nextInt(8))(w))
      withClue(s"trial $trial, corpus $texts: ") {
        assertEqual(texts, nMerges = 6, batchSizes = Seq(2, 4, 32))
      }
    }
  }

  test("documents fixture: batched == sequential at the query " +
      "operating point (nMerges=4, minCount=1)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val seq = BpeTokenizer
      .trainLedgerSequential(docs, "text", nMerges = 4, minCount = 1L)
    val (bat, rounds) = BpeTokenizer.trainLedgerBatchedWithRounds(
      docs, "text", nMerges = 4, minCount = 1L)
    assert(bat === seq)
    // the whole point: fewer scan rounds than merges
    assert(rounds <= seq.length,
      s"batched took $rounds rounds for ${seq.length} merges")
  }

  test("driver-job reduction at a production-like merge count") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val (ledger, rounds) = BpeTokenizer.trainLedgerBatchedWithRounds(
      docs, "text", nMerges = 64, minCount = 2L)
    assert(ledger.length === 64)
    // job accounting: one collect per round + one checkpoint per 8
    // accumulated merges, vs the sequential loop's strict 2 jobs
    // (argmax collect + checkpoint) per merge. The synthetic corpus
    // is conflict-dense (Zipf letter-head: top pairs share common
    // characters), so the exact-batch ratio itself is modest — the
    // amortized checkpoint carries most of the reduction here;
    // diverse-tail corpora batch better.
    val jobs = rounds + (ledger.length + 7) / 8
    val seqJobs = 2 * ledger.length
    info(s"learned ${ledger.length} merges in $rounds scan rounds: " +
      f"~$jobs driver jobs vs $seqJobs sequential " +
      f"(${seqJobs.toDouble / jobs}%.2fx fewer)")
    assert(rounds < ledger.length,
      "the batch must learn more than one merge per round somewhere")
    assert(jobs * 10 <= seqJobs * 6,
      s"expected >= 1.67x driver-job reduction, got $jobs vs $seqJobs")
  }
}
