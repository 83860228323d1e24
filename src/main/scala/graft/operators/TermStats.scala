package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Term-level distribution statistics over the corpus: burstiness
  * (is a term's usage clumped into few docs or spread evenly?) and
  * the word2vec negative-sampling table. Both are single
  * (term)-keyed aggregation chains — vocab-sized outputs, never a
  * corpus reshuffle.
  */
object TermStats {

  /** Burstiness (Fano factor) per term: sample variance / mean of
    * the term's per-document tf, over documents CONTAINING the term
    * (df ≥ `minDf` to make the variance meaningful). Content words
    * are bursty (a doc about trains says "train" ten times);
    * function words are not — Fano ≈ 1 is Poisson scatter, ≫ 1 is
    * topical clumping, the content-word detector Church & Gale
    * (1995) built deviation-from-Poisson models on.
    *
    * Exactness: tf sums and squared sums are LONG/DECIMAL(38)
    * aggregates; mean and variance combine in one written IEEE
    * sequence, 6 dp at the edge (the q_correlation policy). Terms
    * with zero variance (every containing doc uses the term equally
    * often) emit fano = 0 exactly.
    *
    * Output: (term, df, total_tf, mean_tf, fano).
    */
  def burstiness(
      docTerms: DataFrame, docCol: String, termCol: String,
      minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 for a variance: $minDf")
    val d38 = DecimalType(38, 0)
    val tf = docTerms
      .groupBy(col(docCol).as("__d"), col(termCol).as("term"))
      .agg(count(lit(1)).as("__tf"))
    val stats = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("__tf")).as("total_tf"),
        sum(col("__tf").cast(d38) * col("__tf").cast(d38)).as("__stt"))
      .filter(col("df") >= minDf)
    val nD = col("df").cast("double")
    val st = col("total_tf").cast("double")
    val variance =
      (nD * col("__stt").cast("double") - st * st) / (nD * (nD - lit(1.0)))
    val mean = st / nD
    stats.select(col("term"), col("df"), col("total_tf"),
      round(mean, 6).as("mean_tf"),
      round(variance / mean, 6).as("fano"))
  }

  /** Word2vec negative-sampling table: p(term) ∝ count^(3/4)
    * (Mikolov et al. 2013). The fractional power rides the proven
    * cross-engine primitive — x^0.75 = √x · √√x, two
    * correctly-rounded sqrts in one written order (the α=0.5
    * temperature-mixing precedent, one power deeper) — then snaps to
    * an integer micro lattice so the normalizing sum is exact and
    * order-free, and the final share is integer-ppm floor division.
    *
    * Output: (term, cnt, weight_micro, p_ppm). One count
    * aggregation + a broadcast 1-row total — vocab-sized throughout.
    * (Long bound: weight_micro·10⁶ stays under 2^63 while per-term
    * counts are below ~8·10⁸; beyond that move the ppm numerator to
    * DECIMAL — the GroupedOls squared-lattice convention.)
    */
  /** Gini-Simpson diversity per group: the probability two tokens
    * drawn WITHOUT replacement are different types,
    *
    *   D = 1 − Σ cnt·(cnt−1) / (n·(n−1))
    *
    * — an exact integer rational, emitted as ppm by floor division
    * (1e6 − collision_ppm). The ecology-standard evenness gauge,
    * complementing `q_token_entropy`'s Shannon view with one that
    * needs NO logs at all: bit-replayable anywhere. Groups of < 2
    * tokens are dropped (undefined). One (group, term) count, one
    * group rollup. (LONG bound: Σcnt(cnt−1)·10⁶ under 2^63 holds to
    * ~3·10⁶ occurrences of a group's top term; beyond, DECIMAL.)
    *
    * Output: (groupCol, n_tokens, n_types, simpson_ppm).
    */
  def simpsonDiversity(
      docTerms: DataFrame, groupCol: String, termCol: String): DataFrame = {
    val counts = docTerms.groupBy(col(groupCol), col(termCol).as("__t"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__c") * (col("__c") - lit(1L))).as("__coll"))
      .filter(col("n_tokens") >= 2)
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        (lit(1000000L) -
          expr("(__coll * CAST(1000000 AS BIGINT)) div (n_tokens * (n_tokens - 1))"))
          .as("simpson_ppm"))
  }

  def negativeSamplingTable(
      docTerms: DataFrame, termCol: String): DataFrame = {
    val counts = docTerms.groupBy(col(termCol).as("term"))
      .agg(count(lit(1)).as("cnt"))
    val weighted = counts.select(col("term"), col("cnt"),
      round(sqrt(col("cnt").cast("double")) *
        sqrt(sqrt(col("cnt").cast("double"))) * lit(1e6))
        .cast("long").as("weight_micro"))
    val total = weighted.agg(sum(col("weight_micro")).as("__t"))
    weighted.crossJoin(broadcast(total))
      .select(col("term"), col("cnt"), col("weight_micro"),
        expr("(weight_micro * CAST(1000000 AS BIGINT)) div __t")
          .as("p_ppm"))
  }
}
