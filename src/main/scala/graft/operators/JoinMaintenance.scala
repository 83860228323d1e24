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
  * side (broadcast-hinted by default — the usual case for an ingest
  * batch against a 100-TB snapshot; pass `broadcastDeltas = false`
  * for jumbo deltas so AQE picks the strategy from runtime sizes),
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
    *
    * `broadcastDeltas = true` (default) pins the delta as the
    * broadcast build side — right for the usual ingest batch against
    * a huge snapshot. An explicit hint OVERRIDES AQE: a delta beyond
    * the broadcast limit would fail the job rather than demote, so
    * pass `false` for jumbo deltas (backfills) and let AQE pick the
    * join strategy from runtime sizes.
    */
  def joinDelta(
      snapA: DataFrame, deltaA: DataFrame,
      snapB: DataFrame, deltaB: DataFrame,
      leftKey: String, rightKey: String,
      broadcastDeltas: Boolean = true): DataFrame = {
    def hint(df: DataFrame) = if (broadcastDeltas) broadcast(df) else df
    def j(a: DataFrame, b: DataFrame, branch: String) =
      a.join(b, col(leftKey) === col(rightKey))
        .withColumn("branch", lit(branch))
    j(hint(deltaA), snapB, "delta_left")
      .unionByName(j(snapA, hint(deltaB), "delta_right"))
      .unionByName(j(hint(deltaA), deltaB, "delta_both"))
  }
}
