package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalIdsSpec extends SparkSuite {
  import spark.implicits._

  private def df(n: Int) =
    (0 until n).map(i => (i.toLong, f"k${(i * 7919) % n}%05d")).toDF("v", "k")

  test("withOrderedIds equals the single-partition global-window result") {
    val in = (0 until 200).map(i => (i.toLong, f"k${(i * 131) % 1000}%05d"))
      .toDF("v", "k")
    val got = GlobalIds.withOrderedIds(in, "k", "row_id", partitions = 7)
      .select("k", "row_id").as[(String, Long)].collect().sortBy(_._1)
    val want = in.withColumn("row_id", row_number().over(Window.orderBy("k")))
      .select("k", "row_id").as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.map { case (k, r) => (k, r.toLong) }.toSeq)
  }

  test("ids are contiguous 1..n and layout-independent") {
    val in = (0 until 100).map(i => (i.toLong, f"x$i%04d")).toDF("v", "k")
    val a = GlobalIds.withOrderedIds(in, "k", "row_id", partitions = 5)
      .select("v", "row_id").as[(Long, Long)].collect().toMap
    val b = GlobalIds
      .withOrderedIds(in.repartition(13, $"v"), "k", "row_id", partitions = 3)
      .select("v", "row_id").as[(Long, Long)].collect().toMap
    assert(a.values.toSeq.sorted == (1L to 100L))
    assert(a == b, "ids must depend on the key order, not the layout")
  }

  test("rejects reserved __ columns") {
    val bad = df(4).withColumn("__pid", lit(1))
    val e = intercept[IllegalArgumentException] {
      GlobalIds.withOrderedIds(bad, "k")
    }
    assert(e.getMessage.contains("__pid"))
  }
}
