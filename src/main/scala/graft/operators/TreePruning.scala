package graft.operators

import scala.annotation.tailrec

import org.apache.spark.ml.classification.DecisionTreeClassificationModel
import org.apache.spark.ml.graftbridge.TreeBridge
import org.apache.spark.ml.tree.{InternalNode, LeafNode, Node}

/** CART cost-complexity (weakest-link) pruning over a fitted MLlib
  * decision tree — the semantics of rpart's `cp` parameter
  * (`/root/reference/Week5_datingNLP.R:178`, `cp = .02`), which the
  * engine previously approximated with a depth cap (SURVEY H2).
  *
  * A split's complexity is its training-misclassification improvement
  * per extra leaf, scaled by the root-as-leaf error (rpart's cptable
  * normalization):
  *
  *   g(t) = (miss(t) − Σ_leaves(T_t) miss) / (R(root) · (|leaves(T_t)| − 1))
  *
  * Pruning repeats the textbook weakest-link sequence: collapse the
  * internal node(s) with the smallest current g, recompute, stop when
  * every remaining split has g ≥ cp. Growing deep and pruning at cp
  * reproduces rpart's grown-with-cp tree (rpart also refuses splits
  * below cp during growth; post-fit weakest-link reaches the same
  * subtree from above).
  *
  * Driver-side over the in-memory node tree — the model object is
  * already resident on the driver (MLlib's own contract); data never
  * moves. O(iterations × nodes), both tiny.
  */
object TreePruning {

  /** Training misclassification count if `n` were a leaf. */
  private def misclass(n: Node): Double = {
    val s = TreeBridge.classCounts(n)
    s.sum - s.max
  }

  /** (subtree misclass, subtree leaves, min g over internal nodes). */
  private def analyze(n: Node, rootMiss: Double): (Double, Int, Double) =
    n match {
      case l: LeafNode => (misclass(l), 1, Double.PositiveInfinity)
      case in: InternalNode =>
        val (lm, ll, lg) = analyze(in.leftChild, rootMiss)
        val (rm, rl, rg) = analyze(in.rightChild, rootMiss)
        val miss = lm + rm
        val leaves = ll + rl
        val g = (misclass(in) - miss) / (rootMiss * (leaves - 1))
        (miss, leaves, math.min(g, math.min(lg, rg)))
    }

  /** Collapse every internal node whose g (computed on the PRE-pass
    * tree, like [[analyze]]) is ≤ target; an ancestor collapse
    * subsumes its descendants'. Returns (new node, pre-pass miss,
    * pre-pass leaves) so ancestor g values stay consistent.
    */
  private def collapse(
      n: Node, rootMiss: Double, target: Double): (Node, Double, Int) =
    n match {
      case l: LeafNode => (l, misclass(l), 1)
      case in: InternalNode =>
        val (lN, lm, ll) = collapse(in.leftChild, rootMiss, target)
        val (rN, rm, rl) = collapse(in.rightChild, rootMiss, target)
        val miss = lm + rm
        val leaves = ll + rl
        val g = (misclass(in) - miss) / (rootMiss * (leaves - 1))
        val node =
          if (g <= target) TreeBridge.toLeaf(in)
          else TreeBridge.withChildren(in, lN, rN)
        (node, miss, leaves)
    }

  /** The cp-pruned root of `root`: weakest links collapsed until every
    * remaining split has g ≥ cp (rpart keeps splits with CP ≥ cp).
    */
  def pruneRoot(root: Node, cp: Double): Node = {
    val rootMiss = math.max(misclass(root), 1e-12)
    @tailrec def loop(r: Node): Node = {
      val (_, _, minG) = analyze(r, rootMiss)
      if (minG >= cp) r
      else loop(collapse(r, rootMiss, minG)._1)
    }
    loop(root)
  }

  /** rpart-style `prune(model, cp)`: the same classifier with its tree
    * replaced by the cp-optimal subtree. Column params and parent are
    * carried over; numFeatures/numClasses are unchanged by pruning.
    */
  def pruneCp(
      model: DecisionTreeClassificationModel,
      cp: Double): DecisionTreeClassificationModel = {
    val pruned = TreeBridge.withRoot(model, pruneRoot(model.rootNode, cp))
    pruned
      .setFeaturesCol(model.getFeaturesCol)
      .setPredictionCol(model.getPredictionCol)
      .setRawPredictionCol(model.getRawPredictionCol)
      .setProbabilityCol(model.getProbabilityCol)
    if (model.parent != null) pruned.setParent(
      model.parent.asInstanceOf[org.apache.spark.ml.Estimator[
        DecisionTreeClassificationModel]])
    pruned
  }

  /** Leaf count of a tree — a structural assertion helper. */
  def numLeaves(n: Node): Int = n match {
    case _: LeafNode => 1
    case in: InternalNode =>
      numLeaves(in.leftChild) + numLeaves(in.rightChild)
  }
}
