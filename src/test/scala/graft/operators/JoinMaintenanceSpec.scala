package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The delta identity: joinDelta(A, ΔA, B, ΔB) must equal
  * (A∪ΔA) ⋈ (B∪ΔB) minus A ⋈ B, and the three branches must be
  * disjoint.
  */
class JoinMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  test("delta join ≡ full recompute minus old result; branches disjoint") {
    val snapA = Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("a_id", "a_k")
    val deltaA = Seq((4L, 20L), (5L, 30L)).toDF("a_id", "a_k")
    val snapB = Seq((10L, "x"), (30L, "y")).toDF("b_k", "b_v")
    val deltaB = Seq((20L, "z")).toDF("b_k", "b_v")

    val delta = JoinMaintenance.joinDelta(
      snapA, deltaA, snapB, deltaB, "a_k", "b_k")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val old = snapA.join(snapB, col("a_k") === col("b_k"))
    val full = snapA.unionByName(deltaA)
      .join(snapB.unionByName(deltaB), col("a_k") === col("b_k"))
    assert(pairs(delta) === (pairs(full) -- pairs(old)))

    // expected rows, by hand: ΔA⋈B = {(5,30)}; A⋈ΔB = {(2,20)};
    // ΔA⋈ΔB = {(4,20)} — each pair in exactly one branch
    val byBranch = delta.select("a_id", "b_k", "branch").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(byBranch === Map(
      (5L, 30L) -> "delta_left",
      (2L, 20L) -> "delta_right",
      (4L, 20L) -> "delta_both"))
  }
}
