package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge

package object functions {

  /** Porter2 (Snowball English) stem of a string column — the engine's
    * `stem()` scalar function (reference F8).
    */
  def stem(c: Column): Column =
    Bridge.column(StemExpression(Bridge.expression(c)))

  /** Codegen cosine similarity of two embedding-array columns. */
  def cosine_similarity(a: Column, b: Column): Column =
    Bridge.column(
      CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen squared euclidean distance of two embedding-array
    * columns — the kNN scoring kernel.
    */
  def euclidean_dist2(a: Column, b: Column): Column =
    Bridge.column(
      EuclideanDist2(Bridge.expression(a), Bridge.expression(b)))

  /** All random-hyperplane LSH bucket ids (one per table) of an
    * embedding-array column, as `array<long>` — codegen'd single pass.
    */
  def hyperplane_buckets(
      vec: Column, bits: Int, tables: Int, seed: Long = 0x5eedL): Column =
    Bridge.column(
      HyperplaneBucketsExpression(Bridge.expression(vec), bits, tables, seed))

  /** PSL registrable ("owner") domain of a lowercase host column —
    * static rule-base probes inside whole-stage codegen (see
    * [[PublicSuffixes]]).
    */
  def registrable_domain(c: Column): Column =
    Bridge.column(RegistrableDomainExpression(Bridge.expression(c)))

  /** Fused F5+F6 (tokenize + lower) as one codegen pass. */
  def tokenize_lower(c: Column): Column =
    Bridge.column(TokenizeLowerExpression(Bridge.expression(c)))

  /** F5+F6 in ICU fidelity mode: BreakIterator (UAX#29) word
    * segmentation instead of the regex split — hyphenated words stay
    * whole, grouped numbers segment as one token (see
    * [[IcuTokenizeLower]]).
    */
  def icu_tokenize_lower(c: Column): Column =
    Bridge.column(IcuTokenizeLowerExpression(Bridge.expression(c)))

  /** Snowball-stopword count of a token-array column (hashed set probe
    * per token, codegen'd — never an array scan per token).
    */
  def stopword_count(c: Column): Column =
    Bridge.column(StopwordCountExpression(Bridge.expression(c)))

  /** Fused F8+F9 (Porter2 stem + single-char prune) as one codegen pass. */
  def stem_prune(c: Column): Column =
    Bridge.column(StemPruneExpression(Bridge.expression(c)))

  /** Vocabulary bag-of-words counts (`array<string> → ml vector`) as a
    * single codegen pass — backs TrimmedCountVectorizerModel.transform.
    */
  def count_vectorize(c: Column, vocabulary: Array[String]): Column =
    Bridge.column(CountVectorizeExpression(
      Bridge.expression(c), new CountVectorizeKernel(vocabulary)))

  /** Bounded per-group top-k by (score desc, id asc) —
    * `array<struct<score,id>>`, best first. Map-side partial buffers
    * are capped at k, so the aggregation exchange carries ≤ groups×k
    * rows per partition (vs a rank window's every-candidate shuffle).
    * The id must be an INTEGRAL column (byte/short/int/long) and the
    * score numeric — enforced eagerly here, because a silent
    * `cast("bigint")` of a string/uuid id would null every row and
    * return empty top-k sets with no error, and a fractional id would
    * round-trip lossily. Callers whose id type is narrower than long
    * should cast the exploded result back if schema stability matters.
    * Null score/id rows are skipped, not ranked last
    * (see [[TopKByScore]]).
    */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    // Type safety lives in TopKByScore.checkInputDataTypes, which runs
    // at analysis (when types are known — a Column here may still be
    // unresolved) and looks THROUGH these casts at the source types,
    // rejecting non-integral ids and non-numeric scores loudly.
    Bridge.column(TopKByScore(
      Bridge.expression(score.cast("double")),
      Bridge.expression(id.cast("bigint")), k)
      .toAggregateExpression())

  /** Per-group elementwise minimum of equal-length `array<bigint>`
    * columns — the MinHash signature fold (see [[ElementwiseMin]]).
    */
  def elementwise_min(arr: Column): Column =
    Bridge.column(
      ElementwiseMin(Bridge.expression(arr)).toAggregateExpression())

  /** Element `i` of an ml `Vector` column, inside whole-stage codegen
    * (absent sparse slot → 0.0, out-of-range index → null; see
    * [[VectorAt]]). The CART routing kernel.
    */
  def vector_at(vec: Column, idx: Column): Column =
    Bridge.column(
      VectorAt(Bridge.expression(vec), Bridge.expression(idx.cast("int"))))

  /** Nonzero `(index, value)` pairs of an ml `Vector` column as
    * `array<struct<_1:int,_2:double>>`, inside whole-stage codegen —
    * the CART stats-pass kernel (see [[VectorNonzeros]]).
    */
  def vector_nonzeros(vec: Column): Column =
    Bridge.column(VectorNonzeros(Bridge.expression(vec)))

  /** Element-wise product of an ml `Vector` column with a fixed
    * weight array, layout-preserving — the TF-IDF featurize kernel
    * (see [[VectorScale]]).
    */
  def vector_scale(vec: Column, weights: Array[Double]): Column =
    Bridge.column(VectorScale(Bridge.expression(vec), weights))

  /** `array<float|double>` → dense ml vector for KMeans/PCA inputs,
    * null-propagating, inside whole-stage codegen (see
    * [[VectorFromFloats]]).
    */
  def vector_from_floats(arr: Column): Column =
    Bridge.column(VectorFromFloats(Bridge.expression(arr)))

  /** Apply a full BPE merge list (distinct pairs, rank order) to a
    * symbol-array column in one codegen-friendly kernel call —
    * per-word cost independent of the vocabulary size (see
    * [[BpeApplyMerges]]).
    */
  def bpe_apply(syms: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApplyMerges(Bridge.expression(syms), merges))

  /** Distinct word k-gram shingles (space-joined, first-occurrence
    * order) of a token-array column — never null (see
    * [[WordShingles]]).
    */
  def word_shingles(tokens: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), k))

  /** 64-bit SimHash (FNV-1a + majority vote) of a token-array
    * column — never null (see [[SimHash64]]).
    */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}
