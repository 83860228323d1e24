package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Partial-aggregate merge algebra: state ⊕ delta ≡ recompute,
  * including disjoint groups, null values, and repeated merging
  * (associativity over three batches).
  */
class AggMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private val keys = Seq("k")
  private val vals = Seq("v")

  private def collectState(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k")
      .select(col("k"), col("v_cnt"), round(col("v_sum"), 9),
        col("v_min"), col("v_max"))
      .collect().map(_.toSeq).toSeq

  test("merge of history and batch equals recompute; new/absent groups pass through") {
    val history = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("b", Some(5.0)),
      ("b", None), ("gone", Some(9.0))).toDF("k", "v")
    val batch = Seq(
      ("a", Some(3.0)), ("new", Some(7.0)), ("new", None)).toDF("k", "v")
    val merged = AggMaintenance.merge(
      AggMaintenance.partials(history, keys, vals),
      AggMaintenance.partials(batch, keys, vals), keys, vals)
    val full = AggMaintenance.partials(history.union(batch), keys, vals)
    assert(collectState(merged) == collectState(full))
    // 'gone' (history-only) and 'new' (batch-only) both present
    val ks = merged.select("k").as[String].collect().toSet
    assert(ks == Set("a", "b", "gone", "new"))
  }

  test("three batches merge associatively to the recompute") {
    val r = new scala.util.Random(11)
    def batch(seed: Int) = (0 until 200).map { i =>
      (s"k${(i * seed) % 7}", r.nextDouble() * 100)
    }.toDF("k", "v")
    val (b1, b2, b3) = (batch(1), batch(3), batch(5))
    val p = (d: org.apache.spark.sql.DataFrame) =>
      AggMaintenance.partials(d, keys, vals)
    val leftFold = AggMaintenance.merge(
      AggMaintenance.merge(p(b1), p(b2), keys, vals), p(b3), keys, vals)
    val rightFold = AggMaintenance.merge(
      p(b1), AggMaintenance.merge(p(b2), p(b3), keys, vals), keys, vals)
    val full = p(b1.union(b2).union(b3))
    assert(collectState(leftFold) == collectState(full))
    assert(collectState(rightFold) == collectState(full))
  }
}
