package org.apache.spark.ml.graftbridge

import org.apache.spark.ml.classification.DecisionTreeClassificationModel
import org.apache.spark.ml.tree.{InternalNode, LeafNode, Node}
import org.apache.spark.ml.util.Identifiable

/** Documented access point to the `private[ml]` decision-tree node
  * internals needed by cost-complexity pruning
  * (graft.operators.TreePruning): per-node class-count stats, and
  * node/model constructors for rebuilding a pruned tree. Only public
  * Spark types (`Node`, `DecisionTreeClassificationModel`) and plain
  * arrays cross the bridge — the `private[spark]` ImpurityCalculator
  * never leaks out.
  */
object TreeBridge {

  /** Per-class training counts at a node (gini/entropy calculators
    * store class counts as their stats vector).
    */
  def classCounts(node: Node): Array[Double] =
    node.impurityStats.stats.clone()

  /** The node collapsed to a leaf (same prediction/impurity/stats). */
  def toLeaf(node: Node): LeafNode =
    new LeafNode(node.prediction, node.impurity, node.impurityStats)

  /** An internal node rebuilt with (possibly pruned) children. */
  def withChildren(
      orig: InternalNode, left: Node, right: Node): InternalNode =
    new InternalNode(orig.prediction, orig.impurity, orig.gain,
      left, right, orig.split, orig.impurityStats)

  /** A classification model rebuilt around a pruned root; the caller
    * re-applies column params (public setters on the model).
    */
  def withRoot(
      orig: DecisionTreeClassificationModel,
      root: Node): DecisionTreeClassificationModel =
    new DecisionTreeClassificationModel(
      orig.uid, root, orig.numFeatures, orig.numClasses)

  // -- construction helpers (specs build trees with known g values) --

  private def gini(counts: Array[Double]) =
    new org.apache.spark.mllib.tree.impurity.GiniCalculator(
      counts.clone(), counts.sum.toLong)

  /** A leaf with the given per-class training counts. */
  def leafOf(counts: Array[Double]): LeafNode = {
    val c = gini(counts)
    new LeafNode(c.predict, c.calculate(), c)
  }

  /** An internal node (continuous split on `feature` at `threshold`)
    * with the given per-class counts and children.
    */
  def internalOf(
      counts: Array[Double], left: Node, right: Node,
      feature: Int, threshold: Double): InternalNode = {
    val c = gini(counts)
    // Gain must weight child impurities by their class-count totals
    // (CART information gain), not average them: an unweighted mean
    // misreports model.featureImportances / toDebugString for every
    // tree DeterministicCart routes through this constructor. Pruning
    // and transform are unaffected either way (they use class counts).
    val nL = left.impurityStats.count.toDouble
    val nR = right.impurityStats.count.toDouble
    val n = math.max(nL + nR, 1.0)
    new InternalNode(c.predict, c.calculate(),
      c.calculate() - (nL / n) * left.impurity - (nR / n) * right.impurity,
      left, right, new org.apache.spark.ml.tree.ContinuousSplit(
        feature, threshold), c)
  }

  /** A bare classification model around a hand-built root. */
  def modelOf(
      root: Node, numFeatures: Int,
      numClasses: Int): DecisionTreeClassificationModel =
    new DecisionTreeClassificationModel(
      Identifiable.randomUID("dtc"), root, numFeatures, numClasses)
}
