package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The front door: one call chaining the curation stages a pretraining
  * data pipeline runs, in the order production pipelines run them
  * (cheap row-local filters first, pairwise dedup last — every stage
  * shrinks the corpus the next, more expensive stage sees):
  *
  *   1. rule quarantine     — scan-speed row filters ([[DataQuality]])
  *   2. quality floor       — composite score threshold
  *   3. near-dup dedup      — MinHash/LSH pairs → canonical keep
  *                            ([[Dedup]], the only pairwise stage)
  *   4. mixture resampling  — per-domain target rates ([[CorpusMixing]])
  *   5. global ids          — contiguous, layout-independent
  *                            ([[GlobalIds]]; id = (resampled copy) rank
  *                            in md5 order — deterministic end to end)
  *
  * Each stage is the already-verified operator; this object adds only
  * the plumbing and a per-stage row ledger (the number every pipeline
  * report starts with). Configuration deliberately mirrors the
  * defaults of the underlying q_ queries so the composite behavior is
  * the verified behavior.
  */
object CurationPipeline {

  final case class Config(
      minQuality: Double = 0.5,
      minChars: Int = 1,
      jaccardThreshold: Double = 0.8,
      shingleK: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      rates: Map[String, Double] = Map.empty)

  final case class Result(curated: DataFrame, ledger: Seq[(String, Long)])

  /** `docs` needs (idCol, textCol, domainCol). Returns the curated
    * corpus with a contiguous `row_id` plus the per-stage row ledger.
    * Eager (counts each stage boundary): a curation run IS a
    * materialization, and the ledger is part of its contract.
    */
  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      config: Config = Config()): Result = {
    var ledger = Vector.empty[(String, Long)]
    val staged = scala.collection.mutable.Buffer.empty[DataFrame]
    // Pin each stage boundary before counting it: the ledger count AND
    // every downstream stage then read the cached frame, so each
    // stage's work runs once instead of re-executing the whole
    // upstream chain per action (5 counts + the final materialization
    // would otherwise replay quarantine/quality/dedup several times).
    def note(stage: String, df: DataFrame): DataFrame = {
      val pinned = df.persist()
      staged += pinned
      ledger :+= (stage -> pinned.count())
      pinned
    }

    // The raw corpus is counted but never cached — pinning the input
    // is the one thing a 100-TB run must not do; the scan is the
    // cheapest stage to repeat (and runs only once more, in stage 1).
    ledger :+= ("input" -> docs.count())

    // 1. rule quarantine (null/empty/integrity)
    val violations = DataQuality.validate(docs, Seq(idCol), Seq(
      "text_nonnull" -> col(textCol).isNotNull,
      "text_nonempty" -> (length(col(textCol)) >= config.minChars),
      "domain_nonnull" -> col(domainCol).isNotNull))
    val valid = note("quarantine",
      docs.join(violations.select(idCol).distinct(), Seq(idCol), "left_anti"))

    // 2. quality floor
    val scored = valid.withColumn("__q",
      TextAnalysis.qualityScore(col(textCol)))
    val good = note("quality",
      scored.where(col("__q") >= config.minQuality).drop("__q"))

    // 3. near-dup dedup: LSH pairs -> canonical keep
    val tokens = good.select(col(idCol), col(domainCol), col(textCol),
      split(col(textCol), " ", -1).as("__toks"))
    val pairs = Dedup.minhashDedupPairs(tokens, idCol, "__toks",
        config.shingleK, config.bands, config.rowsPerBand,
        config.jaccardThreshold)
      .select(col("id_a"), col("id_b"))
    val deduped = note("dedup",
      Dedup.keepCanonical(good, idCol, pairs))

    // 4. mixture resampling (identity when no rates configured — the
    // ledger entry then reuses the dedup count instead of re-pinning
    // the same frame)
    val dedupCount = ledger.last._2
    val mixed =
      if (config.rates.isEmpty) { ledger :+= ("mix" -> dedupCount); deduped }
      else note("mix", CorpusMixing.resampleByRates(
        deduped, idCol, domainCol, config.rates))

    // 5. contiguous ids in deterministic (md5, copy) order; the copy
    // column exists only when resampling ran. The sort key is NOT
    // __-prefixed — the operators reserve that namespace for their own
    // internals and reject it on inputs (Reserved.check).
    val keyed = mixed.withColumn("curation_sort_key",
      md5(concat_ws("#", col(idCol).cast("string"),
        if (mixed.columns.contains("copy")) col("copy").cast("string")
        else lit("0"))))
    val curated = GlobalIds
      .withOrderedIds(keyed, "curation_sort_key", "row_id")
      .drop("curation_sort_key")

    // withOrderedIds eagerly localCheckpoints its numbered frame, so
    // `curated` no longer reaches back into the stage caches — release
    // them before handing the result out.
    staged.foreach(_.unpersist())
    Result(curated, ledger)
  }
}
