package graft.plans

import graft.SparkSuite
import graft.operators.StorageLayout
import org.apache.spark.sql.functions._

/** Physical-plan gates for the storage-layout operators — the whole
  * point of bucketing/partitioning is a plan property, so the spec
  * asserts the plan, not just the answer (the answer is pinned by the
  * q_bucketed_join / q_partitioned_scan oracles).
  */
class StorageLayoutSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private def tmp(name: String) =
    s"${sys.props("java.io.tmpdir")}/graft_layout_spec/$name"

  test("co-bucketed join plans with zero shuffle Exchange") {
    val (o, l) = StorageLayout.coBucketed(spark,
      graft.Tables.orders(spark, sfDir), "spec_b_orders", "o_orderkey",
      graft.Tables.lineitem(spark, sfDir), "spec_b_lineitem", "l_orderkey",
      numBuckets = 4, baseDir = tmp("cobucket"))
    // Force the join comparison away from broadcast so the property
    // under test (bucketing removes the shuffle) is what's planned.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_extendedprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // and it still computes the right thing
      assert(joined.count() ===
        graft.Tables.lineitem(spark, sfDir)
          .join(graft.Tables.orders(spark, sfDir),
            col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("unbucketed twin of the same join DOES shuffle (the baseline)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = graft.Tables.orders(spark, sfDir)
        .join(graft.Tables.lineitem(spark, sfDir),
          col("o_orderkey") === col("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), s"expected a shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned write prunes non-matching lang directories") {
    val path = tmp("docs_by_lang")
    StorageLayout.writePartitioned(
      graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang")),
      path, Seq("lang"))
    val df = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no PartitionFilters:\n$plan")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang not a partition filter:\n$plan")
    val expected = graft.Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").count()
    assert(df.count() === expected)
  }

  test("point lookup on the bucket key prunes to one bucket") {
    // the read-side payoff beyond join elision: an equality filter on
    // the bucket key scans 1 of N buckets, not the whole table
    StorageLayout.writeBucketed(
      graft.Tables.orders(spark, sfDir), "spec_b_prune", tmp("prune"),
      "o_orderkey", 4)
    // autoBucketedScan turns bucketed reads OFF for plans with no
    // join/agg on the bucket key — pruning needs the bucketed scan
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key, "true")
    try {
      spark.conf.set(key, "false")
      val df = spark.table("spec_b_prune")
        .filter(col("o_orderkey") === 42L)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
        s"bucket pruning missing:\n$plan")
    } finally spark.conf.set(key, prev)
  }

  test("writeBucketed validates numBuckets") {
    intercept[IllegalArgumentException] {
      StorageLayout.writeBucketed(
        graft.Tables.orders(spark, sfDir), "spec_bad", tmp("bad"),
        "o_orderkey", 0)
    }
  }
}
