package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalScanSpec extends SparkSuite {
  import spark.implicits._

  private val df = (1L to 200L).map(i => (i, i * 31 % 17))
    .toDF("id", "v")

  test("equals the naive global window scan") {
    val naive = df.withColumn("prefix",
        coalesce(sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("id").collect().toSeq
    val scanned = GlobalScan.withPrefixSum(df, Seq("id"), "v")
      .orderBy("id").select("id", "v", "prefix").collect().toSeq
    assert(scanned === naive)
  }

  test("invariant to input partitioning and partition count") {
    val a = GlobalScan
      .withPrefixSum(df.repartition(1), Seq("id"), "v", "p", 3)
      .orderBy("id").collect().toSeq
    val b = GlobalScan
      .withPrefixSum(df.repartition(13), Seq("id"), "v", "p", 7)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("prefix < budget is the exact greedy take") {
    // values all 10: budget 35 takes exactly rows with prefix 0,10,
    // 20,30 — the first four in order
    val flat = (1L to 10L).map(i => (i, 10L)).toDF("id", "v")
    val take = GlobalScan.withPrefixSum(flat, Seq("id"), "v")
      .filter(col("prefix") < 35).select("id")
      .as[Long].collect().sorted.toSeq
    assert(take === Seq(1L, 2L, 3L, 4L))
  }

  test("null values scan as zero") {
    val withNulls = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "v")
    val out = GlobalScan.withPrefixSum(withNulls, Seq("id"), "v")
      .orderBy("id").select("prefix").as[Long].collect().toSeq
    assert(out === Seq(0L, 5L, 5L))
  }
}
