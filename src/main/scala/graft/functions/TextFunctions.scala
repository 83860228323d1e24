package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-cleaning primitives of the engine.
  *
  * Semantics derive from the reference pipeline
  * (`/root/reference/Week5_datingNLP.R`): HTML strip (R:53,60), custom
  * pre-tokenize stop-word strip (R:54,61 — case-sensitive, single
  * pass), literal-space split (R:259,266), ICU-style word tokenization
  * (R:65-67), Snowball stop-word removal (R:78-79), single-char token
  * removal (R:86-87). All are pure `Column` functions so Catalyst can
  * fold them into whole-stage codegen; no UDFs on this path.
  */
object TextFunctions {

  /** The reference's 7 HTML-fragment patterns (R:53). Java regex is
    * compatible with these constructs. Note `"\\n"` (literal backslash-n
    * text) and `"\n"` (newline) are both present, as in the reference.
    */
  val htmlPatterns: Seq[String] = Seq(
    "<a[^>]+>",
    "class=[\"'][^\"']+[\"']",
    "&[a-z]+;",
    "\n",
    "\\\\n",
    "<br ?/>",
    "</[a-z]+ ?>"
  )

  /** `paste(html, collapse="|")` wrapped in a group (R:56). */
  val htmlPat: String = htmlPatterns.mkString("(", "|", ")")

  /** The reference's custom stop list (R:54) — 31 words, applied
    * case-sensitively BEFORE lower-casing (quirk Q5 in SURVEY §8).
    */
  val customStopWords: Seq[String] = Seq(
    "a", "am", "an", "and", "as", "at", "are", "be", "but", "can",
    "do", "for", "have", "i'm", "if", "in", "is", "it", "like",
    "love", "my", "of", "on", "or", "so", "that", "the", "to",
    "with", "you", "i")

  /** `\b(w1|w2|...)\b` (R:58). */
  val customStopPat: String = customStopWords.mkString("\\b(", "|", ")\\b")

  /** Snowball English stop list — the quanteda default
    * (`stopwords("english")`, R:78). This is the canonical list from
    * the Snowball project (snowballstem.org english stop.txt); NOT
    * Spark's default English list, which has 181 entries from a
    * different source.
    */
  val snowballStopWords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "your", "yours", "yourself", "yourselves",
    "he", "him", "his", "himself", "she", "her", "hers", "herself",
    "it", "its", "itself", "they", "them", "their", "theirs",
    "themselves", "what", "which", "who", "whom", "this", "that",
    "these", "those", "am", "is", "are", "was", "were", "be", "been",
    "being", "have", "has", "had", "having", "do", "does", "did",
    "doing", "will", "would", "should", "could", "ought",
    "i'm", "you're", "he's", "she's", "it's", "we're", "they're",
    "i've", "you've", "we've", "they've",
    "i'd", "you'd", "he'd", "she'd", "we'd", "they'd",
    "i'll", "you'll", "he'll", "she'll", "we'll", "they'll",
    "isn't", "aren't", "wasn't", "weren't", "hasn't", "haven't",
    "hadn't", "doesn't", "don't", "didn't", "won't", "wouldn't",
    "shan't", "shouldn't", "can't", "cannot", "couldn't", "mustn't",
    "let's", "that's", "who's", "what's", "here's", "there's",
    "when's", "where's", "why's", "how's",
    "a", "an", "the", "and", "but", "if", "or", "because", "as",
    "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how", "all",
    "any", "both", "each", "few", "more", "most", "other", "some",
    "such", "no", "nor", "not", "only", "own", "same", "so", "than",
    "too", "very")

  /** F3 — HTML strip: `str_replace_all(essays, html.pat, " ")` (R:60).
    * Spark `regexp_replace` is global like stringr, so one call.
    */
  def cleanHtml(c: Column): Column = regexp_replace(c, htmlPat, " ")

  /** F4 — custom stop-word strip (R:61): case-sensitive, single-pass. */
  def stripCustomStopWords(c: Column): Column =
    regexp_replace(c, customStopPat, " ")

  /** F1 — essay concatenation (R:51): join with single spaces, empty
    * fields contribute empty strings (so runs of spaces survive —
    * load-bearing for F10's `""` tokens). `concat_ws` skips NULLs but
    * keeps empty strings, hence the `coalesce`.
    */
  def assembleEssays(cols: Seq[Column]): Column =
    concat_ws(" ", cols.map(c => coalesce(c, lit(""))): _*)

  /** F10 — literal-space split (R:259): single literal space, keep
    * empty strings (limit -1), so `""` is a legal (and frequent) token.
    */
  def splitWords(c: Column): Column = split(c, " ", -1)

  /** F5 — word tokenization approximating quanteda
    * `tokens(what="word", remove_numbers, remove_punct, remove_symbols,
    * remove_hyphens)` (R:65-67): split on any run of characters that is
    * not a letter, digit, or apostrophe (hyphens therefore split
    * words), then drop pure-number tokens and empties. Divergence from
    * ICU word segmentation on exotic scripts is documented in SURVEY §8
    * H1; golden tests pin downstream aggregates.
    */
  def tokenizeWords(c: Column): Column = {
    val rawTokens = split(c, "[^\\p{L}\\p{N}']+", -1)
    filter(rawTokens, t =>
      (t =!= "") && !(t rlike "^[\\p{N}][\\p{N}.,]*$"))
  }

  /** F6 — lower-case every token (R:73). */
  def lowerTokens(tokens: Column): Column =
    transform(tokens, t => lower(t))

  /** F7 — Snowball stop-word removal on a token array (R:78-79). */
  def removeStopWords(tokens: Column): Column = {
    val stops = array(snowballStopWords.map(lit): _*)
    filter(tokens, t => !array_contains(stops, t))
  }

  /** F9 — drop single-character [a-z] tokens post-stem (R:86-87).
    * Expressed as comparisons, not `rlike "^[a-z]$"`: inside the
    * interpreted array filter a regex costs a Matcher allocation and a
    * UTF8String→String copy per token (measured hot at 9M tokens);
    * the length + range test is equivalent for this pattern.
    */
  def removeSingleChar(tokens: Column): Column =
    filter(tokens, t =>
      !(length(t) === 1 && t >= "a" && t <= "z"))

  /** F8 — Porter2 (Snowball English) stem of every token (R:84),
    * via the native Catalyst expression (codegen, null-safe).
    */
  def stemTokens(tokens: Column): Column =
    transform(tokens, t => graft.functions.stem(t))
}
