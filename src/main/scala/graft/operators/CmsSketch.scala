package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as RELATIONS (Cormode & Muthukrishnan 2005) —
  * the frequency-sketch complement of the engine's HLL
  * (q_distinct_sketch) and Misra-Gries ([[HeavyHitters]]) summaries.
  * The counter matrix is a (depth × width) table of rows, built by
  * ONE map-side-combined aggregation over the corpus; point queries
  * are a broadcast join + min. depth·width = 4096 counters bounds
  * the summary at kilobytes regardless of corpus size, and two
  * sketches merge by summing counters on (j, bucket) — the
  * mergeability that makes it a per-partition/per-day rollup unit.
  *
  * Unlike Spark's built-in `stat.countMinSketch` (random seeds, not
  * replayable), hashing here is the engine's md5-prefix lattice: row
  * j's bucket is `(h1 + j·h2) mod width` with h1/h2 carved from the
  * term's 60-bit md5 prefix (Kirsch–Mitzenmacher double hashing,
  * h2 forced odd) — every counter is a pure integer function of the
  * term bytes, bit-replayable in any engine with md5.
  *
  * Estimates overcount, never undercount: `estimate(t) ≥ count(t)`,
  * with `estimate ≤ count + εN` w.h.p. at ε = e/width.
  */
object CmsSketch {

  val Depth = 4
  val Width = 1024

  /** 60-bit md5-prefix hash (the [[CorpusMixing.hashFraction]]
    * domain) split into the double-hashing pair: h1 = low 20 bits,
    * h2 = next 20 bits forced odd. INTEGER `div` throughout — a
    * double division of the 60-bit h would round above 2^53.
    */
  private def withHashPair(df: DataFrame, item: Column): DataFrame =
    df.withColumn("__h",
        conv(substring(md5(item.cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("__h1", expr("__h % 1048576"))
      .withColumn("__h2", expr("((__h div 1048576) % 1048576) * 2 + 1"))

  private def buckets: Column =
    posexplode(array((0 until Depth).map(j =>
      (col("__h1") + lit(j.toLong) * col("__h2")) % lit(Width.toLong)): _*))

  /** Build the counter table `(j, bucket, cnt)` over every row of
    * `itemCol` — one aggregation pass, ≤ Depth·Width output rows.
    */
  def buildCounters(items: DataFrame, itemCol: String): DataFrame =
    withHashPair(items.select(col(itemCol)), col(itemCol))
      .select(buckets.as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-query estimates for `probes` (distinct values of
    * `itemCol`): `(itemCol, cms_cnt)` = min over the Depth counters.
    * The COUNTER side broadcasts — it is the ≤ Depth·Width-row table
    * (and the probe side, being the preserved side of the left join,
    * cannot be broadcast anyway) — so an arbitrarily large probe set
    * never shuffles.
    */
  def estimate(
      counters: DataFrame, probes: DataFrame, itemCol: String): DataFrame =
    withHashPair(probes.select(col(itemCol)), col(itemCol))
      .select(col(itemCol), buckets.as(Seq("j", "bucket")))
      .join(broadcast(counters), Seq("j", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_cnt"))
}
