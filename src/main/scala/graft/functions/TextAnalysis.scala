package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting
  * (whitespace + BPE-ish regex estimate), quality scoring, lexicon
  * language ID, and document fingerprinting. All pure column
  * expressions (codegen'd, per-row, shuffle-free) so they run at scan
  * speed over 100 TB.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def whitespaceTokenCount(text: Column): Column =
    size(split(text, " ", -1))

  /** GPT-2-style pre-tokenizer pattern (simplified, case-sensitive,
    * no unicode categories beyond L/N): contractions, letter runs,
    * digit runs, punctuation runs — each optionally preceded by one
    * space. A cheap upper-bound estimate of BPE token count.
    */
  val bpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish token-count estimate: number of pre-tokenizer matches. */
  def bpeTokenEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Sentence count: runs of terminal punctuation (`.`, `!`, `?`),
    * clamped to ≥ 1 so fragment-only docs still divide cleanly.
    */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))

  /** Syllable-count estimate: vowel-group runs (`[aeiouyAEIOUY]+`),
    * clamped to ≥ 1. The standard dictionary-free heuristic — exact
    * syllabification needs a pronunciation lexicon; vowel runs are
    * within ~10% on English prose and 100% replayable cross-engine.
    */
  def syllableEstimate(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[aeiouyAEIOUY]+"), lit(0))),
      lit(1))

  /** Flesch-Kincaid grade level from the three counts above:
    *
    *   0.39·words/sentences + 11.8·syllables/words − 15.59
    *
    * All three inputs are exact integers, so the double combine is a
    * fixed IEEE op sequence (two divisions, two multiplies, add,
    * subtract — written in this order in the oracle too) and the
    * 6-dp edge replays bit-for-bit. Pure row-local expression:
    * readability over 100 TB is a scan, no shuffle.
    */
  def fleschKincaidGrade(
      words: Column, sentences: Column, syllables: Column): Column =
    lit(0.39) * (words.cast("double") / sentences.cast("double")) +
      lit(11.8) * (syllables.cast("double") / words.cast("double")) -
      lit(15.59)

  /** Fraction of whitespace tokens that are Snowball stopwords. The
    * count runs as the native [[StopwordCountExpression]] — one hashed
    * set probe per token inside whole-stage codegen, not an interpreted
    * HOF re-scanning a 175-element literal array per token.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = split(text, " ", -1)
    stopword_count(toks).cast("double") / size(toks).cast("double")
  }

  /** Fraction of distinct tokens (type/token ratio). */
  def uniqueRatio(text: Column): Column = {
    val toks = split(text, " ", -1)
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")
  }

  /** Fraction of non-[letter digit space] characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^\\p{L}\\p{N} ]", "")))
      .cast("double") / length(text).cast("double")

  /** Composite quality score in [0,1]: rewards mid-length documents,
    * lexical diversity, and a natural (neither zero nor dominant)
    * stopword rate; penalizes punctuation soup. Deterministic
    * arithmetic, reproducible in SQL.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val diversity = uniqueRatio(text)
    val stopPenalty = abs(stopwordRatio(text) - 0.4)
    val punct = punctRatio(text)
    round(
      lenScore * 0.3 + diversity * 0.3 +
        (lit(1.0) - stopPenalty) * 0.3 + (lit(1.0) - punct) * 0.1, 6)
  }

  /** Deflate compression ratio of the text (compressed bytes / raw
    * UTF-8 bytes, level 6, raw stream): the cheap entropy/boilerplate
    * signal production pipelines filter on — degenerate repetition
    * compresses far below natural prose, and random noise compresses
    * above it, so both tails of the ratio are drop candidates
    * (RefinedWeb/MassiveText-style). A Scala UDF by necessity: Spark
    * has no compression scalar, and the kernel is a per-row byte op
    * at the same documented boundary as the bloom-filter probe.
    * Deterministic (fixed level, no preset dictionary, ratio of byte
    * counts) but not SQL-replayable — CompressionRatioSpec covers it;
    * no oracle query.
    */
  val compressionRatio = udf { s: String =>
    if (s == null || s.isEmpty) 1.0
    else {
      val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total.toDouble / raw.length
      } finally d.end()
    }
  }

  /** Tiny function-word lexicons for the lexicon-overlap language ID.
    * Real deployments would use char-n-gram profiles; the lexicon
    * variant is shuffle-free, SQL-reproducible, and good enough to
    * route documents.
    */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein",
      "eine", "zu", "den", "von", "für", "auf", "im"),
    "en" -> Seq("the", "and", "is", "not", "with", "a", "an", "to", "of",
      "for", "on", "in", "that", "it", "as"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "no", "con", "un",
      "una", "de", "para", "en", "que", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "avec", "un",
      "une", "de", "pour", "dans", "que", "il", "sur"),
    "zh" -> Seq("的", "是", "不", "和", "在", "了", "有", "我", "他",
      "这", "中", "大", "上", "个", "们"))

  /** Per-language overlap score: distinct whitespace tokens ∩ lexicon. */
  def langScore(text: Column, lang: String): Column = {
    val lex = array(
      langLexicons.find(_._1 == lang).get._2.map(lit): _*)
    size(array_intersect(array_distinct(split(text, " ", -1)), lex))
  }

  /** Predicted language: argmax lexicon overlap, ties broken
    * alphabetically, 'und' (undetermined) when every score is 0.
    */
  def langId(text: Column): Column = {
    val scored = langLexicons.map { case (l, _) =>
      struct(langScore(text, l).as("s"), lit(l).as("l"))
    }
    val best = array_sort(array(scored: _*),
      (a, b) => when(a("s") > b("s"), -1)
        .when(a("s") < b("s"), 1)
        .when(a("l") < b("l"), -1)
        .when(a("l") > b("l"), 1)
        .otherwise(0))(0)
    when(best("s") > 0, best("l")).otherwise(lit("und"))
  }

  /** Canonical content fingerprint: md5 of the sorted distinct token
    * set (order- and repetition-insensitive; exact-dedup key for
    * re-ordered copies).
    */
  def fingerprintCanonical(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(text, " ", -1)))))

  /** Gopher/MassiveText-style repetition statistics per document
    * (Rae et al. 2021 §A1.1 quality filters, token-level variants):
    * duplicate-token fraction (1 − types/tokens) and top-bigram
    * fraction (tokens covered by the single most frequent bigram /
    * total tokens) — the signals used to drop boilerplate and
    * degenerate repetition from pretraining corpora.
    *
    * Relational and doc-partitioned throughout: one explode, a lead
    * window, and two aggregations all keyed by doc id — the exchange
    * happens once and is reused (same shape as Dedup's span pass).
    */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ", -1)))
      .select(col("doc_id"), col("pos"), col("col").as("word"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // concat null-propagates: the last position's bigram is null and
    // dropped, like the oracle's `word || ' ' || lead(word)`
    val bigrams = words
      .withColumn("bigram",
        concat(col("word"), lit(" "), lead(col("word"), 1).over(w)))
      .filter(col("bigram").isNotNull)
    val topBigram = bigrams
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_bi"))
    val totals = words.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("word")).as("n_types"))
    totals.join(topBigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (lit(1.0) - col("n_types").cast("double")
          / col("n_tokens").cast("double")).as("dup_token_frac"),
        // fraction of BIGRAM POSITIONS held by the top bigram —
        // always in [0, 1]. (An earlier revision used max_bi·2 /
        // n_tokens, "tokens covered": overlapping occurrences share
        // tokens, so "x x x" scored 4/3 — a fraction above 1.)
        coalesce(
          col("max_bi").cast("double")
            / greatest(col("n_tokens") - 1L, lit(1L)).cast("double"),
          lit(0.0)).as("top_bigram_frac"))
  }

  /** Winnowing-style fingerprint: minimum md5 over word k-gram
    * shingles (a 1-hash MinHash; a stable representative shingle) —
    * shingling via the native [[WordShingles]] kernel (round 19;
    * the UDF it replaces shared Dedup's shingle semantics verbatim).
    */
  def fingerprintWinnow(text: Column, k: Int): Column =
    array_min(transform(
      graft.functions.word_shingles(split(text, " ", -1), k),
      sh => md5(sh)))
}
