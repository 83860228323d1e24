package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental JOIN maintenance: the join-side sibling of
  * [[AggMaintenance]]. When an equi-join's result is materialized and
  * a new ingest batch appends ΔA and ΔB, the NEW result rows are
  * exactly
  *
  *   ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * (for append-only inputs — deletes/updates go through the CDC MERGE
  * path, [[ChangeApply]], before this). Recomputing A' ⋈ B' from
  * scratch re-shuffles both full snapshots every batch; the delta form
  * touches each snapshot once, joined against a batch-sized side.
  *
  * Scale shape: both snapshot-side joins put the DELTA on the build
  * side (broadcast when it fits — the usual case for an ingest batch
  * against a 100-TB snapshot; AQE picks sort-merge when it does not),
  * so the snapshots stream map-side and are never joined against each
  * other. ΔA ⋈ ΔB is batch × batch. Each output pair (a, b) has
  * exactly one side in exactly one branch, so the union is
  * duplicate-free by construction — no distinct pass.
  */
object JoinMaintenance {

  /** New inner-join rows contributed by (`deltaA`, `deltaB`) on top of
    * snapshots (`snapA`, `snapB`), equi-joined on `leftKey = rightKey`.
    * Output: `leftCols ++ rightCols`, plus `branch` ∈
    * {delta_left, delta_right, delta_both} for observability.
    * Column sets must be disjoint after selection (caller aliases).
    */
  def joinDelta(
      snapA: DataFrame, deltaA: DataFrame,
      snapB: DataFrame, deltaB: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    def j(a: DataFrame, b: DataFrame, branch: String) =
      a.join(b, col(leftKey) === col(rightKey))
        .withColumn("branch", lit(branch))
    j(broadcast(deltaA), snapB, "delta_left")
      .unionByName(j(snapA, broadcast(deltaB), "delta_right"))
      .unionByName(j(broadcast(deltaA), deltaB, "delta_both"))
  }
}
