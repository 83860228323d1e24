package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-prefiltered equi-join — the shuffle-volume lever for a
  * large⋈selective join: when the build side keeps few distinct keys
  * but is too big (or too late-derived) to broadcast-join outright, a
  * Bloom filter over its keys IS broadcast-friendly at any build-side
  * row count (bits ≈ 1.44·log2(1/fpp) per key — 10M keys at 1% fpp
  * ≈ 17 MB). Probe rows that cannot match are dropped map-side,
  * BEFORE the exchange, so the shuffle carries ~selectivity·|probe|
  * rows instead of all of them; the subsequent real join removes the
  * filter's ~fpp false positives, so the result is EXACT — the
  * `Dedup.contaminatedDocsBloom` move generalized to joins.
  *
  * Built on Spark's own runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — native
  * codegen'd Catalyst expressions, no UDF, no driver-side filter
  * build): the same rewrite AQE injects for shuffle joins, available
  * here EXPLICITLY for the places the optimizer can't see — across
  * persisted stage boundaries, checkpointed pipelines, or non-SQL
  * operator chains. The filter aggregates distributed (map-side
  * partials merged), lands in a 1-row frame, and broadcasts.
  *
  * An empty build side yields a null filter; `might_contain(null,x)`
  * is null, so the prefilter drops every probe row — the correct
  * empty-join result, with no special case.
  */
object BloomJoin {

  /** Probe rows whose `key` might exist in `build` — a guaranteed
    * superset of the true matches, ~fpp of the rest. Stack ahead of
    * joins/aggregations; compose with [[innerPrefiltered]] for the
    * exact-join shape.
    */
  def prefilter(
      probe: DataFrame, build: DataFrame, key: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0, "expectedKeys must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val numBits = math.ceil(
      -expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bloomAgg = Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(col(key))),
        Literal(expectedKeys), Literal(numBits))
        .toAggregateExpression())
    // might_contain demands a constant or scalar subquery for the
    // filter binary (the shape the AQE rewrite produces) — wrap the
    // 1-row build aggregate as a ScalarSubquery, evaluated once and
    // shipped to every task as a literal.
    val bf = build.select(bloomAgg.as("__bf"))
    probe.filter(Bridge.column(BloomFilterMightContain(
      ScalarSubquery(bf.queryExecution.analyzed),
      Bridge.expression(xxhash64(col(key))))))
  }

  /** Inner-join `probe` to `build` on `key` with the map-side bloom
    * reduction. Exact: ≡ `probe.join(build, key)` for any filter
    * quality (BloomJoinSpec and q_bloom_join's plain-join oracle).
    */
  def innerPrefiltered(
      probe: DataFrame, build: DataFrame, key: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame =
    prefilter(probe, build, key, expectedKeys, fpp).join(build, Seq(key))
}
