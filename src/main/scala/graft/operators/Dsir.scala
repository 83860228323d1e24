package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data Selection via Importance Resampling (Xie et al. 2023, DSIR):
  * score every raw document by how much more likely its tokens are
  * under a TARGET distribution (a trusted high-quality slice) than
  * under the RAW corpus distribution, then keep the top slice by that
  * importance weight. The published method uses hashed n-gram unigram
  * models; this is the unigram form over the corpus vocabulary (at
  * 100 TB, substitute `xxhash64(word) % 2^20` as the feature key to
  * bound the model — the plan shape is identical, one aggregation
  * keyed by feature).
  *
  * `log w(d) = Σ_{tokens t} [ log10 p_target(t) − log10 p_raw(t) ]`
  * with add-one smoothing over the JOINT vocabulary, so every raw
  * token has mass under both models and the weight is total.
  *
  * Scale design:
  *  - both models come from ONE map-side-combined aggregation over the
  *    token stream (`sum(when(isTarget,1))` rides the same groupBy as
  *    the raw count — the target is a filtered view, not a second
  *    scan);
  *  - totals broadcast via a 1-row crossJoin (the q_token_budget
  *    pattern), never a driver-side collect;
  *  - scoring joins tokens to the vocabulary-sized ratio table
  *    (AQE-broadcast when it fits) and sums per doc — shuffles are
  *    keyed by word then doc id, never any pair shape.
  *
  * Determinism across engines: each per-word log-ratio is rounded to
  * 9 dp, per-doc accumulation is exact DECIMAL(38,12) (order-free),
  * and only the final weight is cast to double, rounded at the 6 dp
  * edge — the UnigramLM discipline.
  */
object Dsir {

  /** Per-document importance weights: `(idCol, n_tokens, weight)`,
    * one row per document (target documents score too — their weights
    * are the calibration diagonal). `isTarget` is a boolean Column
    * over `docs`'s columns selecting the target slice.
    */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column): DataFrame = {
    Reserved.check("docs" -> docs)
    val toks = docs
      .select(col(idCol), isTarget.as("__t"),
        explode(split(col(textCol), " ", -1)).as("__w"))

    val counts = toks
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__rc"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"))
    val totals = counts.agg(
      sum(col("__rc")).as("__rtot"),
      sum(col("__tc")).as("__ttot"),
      count(lit(1)).as("__v"))

    // Add-one smoothed log-ratio per word, snapped to the 9-dp
    // lattice before any accumulation.
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("__w"),
        round(
          log10((col("__tc") + lit(1)).cast("double") /
            (col("__ttot") + col("__v")).cast("double")) -
            log10((col("__rc") + lit(1)).cast("double") /
              (col("__rtot") + col("__v")).cast("double")),
          9).as("__lr"))

    // Broadcast the MODEL, not the corpus: without the hint the
    // static planner may pick the token stream as the build side
    // (aggregate-derived stats are unreliable), which inverts
    // fatally at scale. The ratio table is vocabulary-sized; the
    // published method bounds it by construction (hashed features),
    // so the broadcast is safe.
    toks
      .join(broadcast(ratios), Seq("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(
          sum(col("__lr").cast(DecimalType(38, 12))).cast("double"),
          6).as("weight"))
  }
}
