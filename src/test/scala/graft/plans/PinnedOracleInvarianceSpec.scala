package graft.plans

import graft.SparkSuite

/** The generic r14 lesson, institutionalized: a pinned-constant
  * oracle (a VALUES table captured from the query's own output) is
  * only honest if the query is a pure function of (data, params) —
  * NOT of the session configuration. r14's q_confusion pin desynced
  * because two stages silently depended on
  * `spark.sql.shuffle.partitions` (the stratified split's default
  * shard count, and MLlib's partition-layout-dependent tree fit);
  * the 4-CPU local default masked it until the 32-CPU driver sweep.
  *
  * This spec runs EVERY fixture-output-pinned query under two
  * deliberately different shuffle-partition settings and asserts
  * bit-identical results. It cannot prove cross-machine
  * reproducibility (each operator argues that in its own scaladoc —
  * exact integer statistics, StrictMath, content hashing), but it
  * mechanically catches the config-dependence class that actually
  * shipped. New pinned oracles MUST be added to [[pinned]].
  */
class PinnedOracleInvarianceSpec extends SparkSuite {

  /** Every query whose oracle pins constants captured from its own
    * sf0.01 output (the q_pca_variance move).
    */
  private val pinned = Seq(
    "q_pca_variance",    // SpectralPca spectrum
    "q_stem_terms",      // stemmed vocabulary + counts
    "q_pipeline_tokens", // word → stem fixture map
    "q_confusion",       // DeterministicCart 2×2, shards pinned
    "q_tsne",            // StrictMath solver embedding
    // not a VALUES pin, but the oracle's `TRUE AS cand_linear_ok`
    // pins the measured-candidate-budget verdict — the xxhash64
    // candidate SET must not drift with layout
    "q_dedup_minhash_scale")

  test("pinned-constant oracle queries are invariant to " +
      "spark.sql.shuffle.partitions") {
    val dir = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(q: String, parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.SparkEntry.queries(q)(spark, dir)
        .collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    for (q <- pinned) {
      val a = run(q, "3")
      val b = run(q, "13")
      assert(a === b, s"$q drifts with shuffle partitions")
      assert(a.nonEmpty, s"$q returned no rows at sf0.001")
    }
  }
}
