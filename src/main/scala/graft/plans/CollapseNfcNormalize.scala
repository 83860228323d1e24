package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NfcNormalizeExpression

/** Optimizer rule: collapse nested NFC normalizations. NFC is
  * idempotent by definition (Unicode TR15 — the canonical form of a
  * canonical form is itself), and defensive pipelines compose
  * normalization freely ("normalize at ingest" + "normalize before
  * hashing"), so `nfc(nfc(x))` is a real plan shape — and each
  * redundant layer costs an `isNormalized` scan per row even on the
  * fast path. Registered via
  * [[graft.GraftExtensions]]'s `injectOptimizerRule` — the
  * library's demonstration that its custom expressions participate
  * in Catalyst optimization like builtins do, not just in codegen.
  */
object CollapseNfcNormalize extends Rule[LogicalPlan] {

  @scala.annotation.tailrec
  private def innermost(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = e match {
    case NfcNormalizeExpression(c) => innermost(c)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // collapse the WHOLE chain in one application — a single-layer
      // rewrite would need the optimizer's fixpoint loop to finish
      // the job, and this rule must also be correct when applied once
      case n @ NfcNormalizeExpression(_: NfcNormalizeExpression) =>
        NfcNormalizeExpression(innermost(n))
    }
}
