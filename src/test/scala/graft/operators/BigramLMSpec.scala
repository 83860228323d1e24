package graft.operators

import graft.SparkSuite

class BigramLMSpec extends SparkSuite {
  import spark.implicits._

  test("transitions extracts adjacent pairs row-locally") {
    val docs = Seq((1L, "a b c"), (2L, "x"), (3L, "p q")).toDF("doc_id", "text")
    val t = BigramLM.transitions(docs, "doc_id", "text")
      .orderBy("doc_id", "w1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(t === Seq((1L, "a", "b"), (1L, "b", "c"), (3L, "p", "q")))
    // no shuffle: the pair build is an array transform, not a window
    val plan = BigramLM.transitions(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("shuffled word salad scores higher than the corpus idiom") {
    // Same unigram distribution in both docs — only transition order
    // differs, which a unigram LM cannot see.
    val idiom = "the cat sat on the mat"
    val salad = "mat the on sat cat the"
    val filler = Seq.tabulate(8)(i =>
      (10L + i, "the cat sat on the mat again and again"))
    val docs = (filler :+ (1L, idiom) :+ (2L, salad)).toDF("doc_id", "text")
    val out = BigramLM.crossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) > out(1L),
      s"salad ${out(2L)} should out-score idiom ${out(1L)}")
  }

  test("single-token docs are absent; counts are per-transition") {
    val docs = Seq((1L, "a b c d"), (2L, "solo")).toDF("doc_id", "text")
    val out = BigramLM.crossEntropy(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head.getLong(1) === 3L) // n_transitions = tokens - 1
  }

  test("collocations: an exclusive pair out-ranks a promiscuous one; " +
      "minCount drops rare pairs") {
    // "new york" always co-occur exclusively; "the" pairs with many
    // words; "rare gem" is perfect but appears only twice.
    val docs = (1L to 10L).map(i =>
      (i, s"new york is the city the place the spot t$i")) ++
      Seq((11L, "rare gem rare gem x"))
    val df = docs.toDF("doc_id", "text")
    val out = BigramLM.collocations(df, "doc_id", "text",
      minCount = 3, k = 5).collect()
    val pairs = out.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.head === (("new", "york")))
    assert(!pairs.contains(("rare", "gem"))) // c12=2 < minCount
    // every returned joint count respects the floor
    assert(out.forall(_.getLong(2) >= 3L))
  }

  test("result is partitioning-independent") {
    val docs = (1L to 40L).map(i =>
      (i, s"tok${i % 5} tok${(i + 1) % 7} tok${(i + 2) % 3} tok${i % 2}"))
      .toDF("doc_id", "text")
    val a = BigramLM.crossEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = BigramLM.crossEntropy(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("kneserNey matches the hand-computed interpolated-KN lattice") {
    // c12: (a,b)=2, (a,c)=1; c(a·)=3, N1+(a·)=2; N1+(·b)=N1+(·c)=1;
    // N1+(··)=2. p(b|a) = (2−.75)/3 + (.75·2/3)·(1/2) = 2/3
    // p(c|a) = (1−.75)/3 + (.75·2/3)·(1/2) = 1/3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = BigramLM.kneserNey(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val xB = math.rint(-math.log10(2.0 / 3.0) * 1e6) / 1e6
    val xC = math.rint(-math.log10(1.0 / 3.0) * 1e6) / 1e6
    assert(out === Seq((1L, 1L, xB), (2L, 1L, xB), (3L, 1L, xC)))
  }

  test("kneserNey is partitioning-independent and covers every doc " +
      "with >= 2 tokens (self-fit model has no unseen transitions)") {
    val docs = (1L to 30L).map(i =>
      (i, s"w${i % 4} w${(i + 1) % 6} w${i % 3} w${(i + 2) % 5}"))
      .toDF("doc_id", "text")
    val a = BigramLM.kneserNey(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = BigramLM.kneserNey(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.size === 30)
  }
}
