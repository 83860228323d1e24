package graft.operators

import graft.SparkSuite
import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.graftbridge.TreeBridge
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.tree.{InternalNode, LeafNode}
import org.apache.spark.sql.functions._

/** Cost-complexity (weakest-link) pruning: hand-built trees with known
  * g values, then an end-to-end fit→prune→transform round trip.
  *
  * The hand-built tree (class counts, 2 classes):
  *
  *   root (100,100)                       g = (100−11)/(100·3) ≈ 0.297
  *   ├─ L (90,10)  split f1               g = (10−9)/(100·1)   = 0.01
  *   │  ├─ LL (85,4)
  *   │  └─ LR (5,6)
  *   └─ R (10,90)  split f2               g = (10−2)/(100·1)   = 0.08
  *      ├─ RL (10,2)
  *      └─ RR (0,88)
  */
class TreePruningSpec extends SparkSuite {

  private def builtTree = {
    val ll = TreeBridge.leafOf(Array(85.0, 4.0))
    val lr = TreeBridge.leafOf(Array(5.0, 6.0))
    val l = TreeBridge.internalOf(Array(90.0, 10.0), ll, lr, 1, 0.5)
    val rl = TreeBridge.leafOf(Array(10.0, 2.0))
    val rr = TreeBridge.leafOf(Array(0.0, 88.0))
    val r = TreeBridge.internalOf(Array(10.0, 90.0), rl, rr, 2, 0.5)
    TreeBridge.internalOf(Array(100.0, 100.0), l, r, 0, 0.5)
  }

  test("cp below min g keeps the whole tree") {
    val pruned = TreePruning.pruneRoot(builtTree, cp = 0.005)
    assert(TreePruning.numLeaves(pruned) == 4)
  }

  test("cp=0.02 collapses exactly the weak split") {
    val pruned = TreePruning.pruneRoot(builtTree, cp = 0.02)
    assert(TreePruning.numLeaves(pruned) == 3)
    val in = pruned.asInstanceOf[InternalNode]
    // left child collapsed to a leaf predicting its majority class 0
    val left = in.leftChild
    assert(left.isInstanceOf[LeafNode])
    assert(left.prediction == 0.0)
    // right subtree intact
    assert(in.rightChild.isInstanceOf[InternalNode])
  }

  test("cp=0.1 prunes both children but keeps the root split") {
    val pruned = TreePruning.pruneRoot(builtTree, cp = 0.1)
    assert(TreePruning.numLeaves(pruned) == 2)
    val in = pruned.asInstanceOf[InternalNode]
    assert(in.leftChild.isInstanceOf[LeafNode])
    assert(in.rightChild.isInstanceOf[LeafNode])
    assert(in.leftChild.prediction == 0.0)
    assert(in.rightChild.prediction == 1.0)
  }

  test("cp above the root's g collapses to a single leaf") {
    val pruned = TreePruning.pruneRoot(builtTree, cp = 0.9)
    assert(TreePruning.numLeaves(pruned) == 1)
  }

  test("pruning is idempotent") {
    val once = TreePruning.pruneRoot(builtTree, cp = 0.02)
    val twice = TreePruning.pruneRoot(once, cp = 0.02)
    assert(TreePruning.numLeaves(once) == TreePruning.numLeaves(twice))
  }

  test("fit deep, prune, transform: fewer leaves, accuracy holds") {
    import spark.implicits._
    // f0 is the real signal (25% label noise, so the root error — cp's
    // scale — is large). f2 marks a ~1% pocket whose labels are mostly
    // flipped: splitting on it DOES change predictions (so MLlib keeps
    // it — Spark already removes same-prediction splits itself) but
    // improves training misclassification by only ~6 rows, far below
    // cp·R(root) ≈ 20 — exactly the overfit split cp pruning removes.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { _ =>
      val f0 = rnd.nextInt(2)
      val f2 = if (rnd.nextDouble() < 0.01) 1 else 0
      val label =
        if (f2 == 1) { if (rnd.nextDouble() < 0.2) f0 else 1 - f0 }
        else { if (rnd.nextDouble() < 0.25) 1 - f0 else f0 }
      (label.toDouble,
        Vectors.dense(f0.toDouble, rnd.nextInt(2).toDouble, f2.toDouble))
    }
    val df = rows.toDF("label", "features")
    val deep = new DecisionTreeClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxDepth(8).setSeed(1L)
      .fit(df)
    val pruned = TreePruning.pruneCp(deep, cp = 0.02)
    assert(TreePruning.numLeaves(pruned.rootNode)
      < TreePruning.numLeaves(deep.rootNode))
    // the signal split survives: pruned tree still separates on f0
    def acc(m: org.apache.spark.ml.classification
        .DecisionTreeClassificationModel): Double =
      m.transform(df).filter(col("prediction") === col("label")).count()
        .toDouble / 2000.0
    assert(acc(pruned) >= 0.72, s"pruned accuracy ${acc(pruned)}")
    // pruning trades at most the pocket rows (~1%) of training fit
    assert(acc(pruned) >= acc(deep) - 0.02)
    // noise splits gone: the cp-optimal tree for one clean signal bit
    // is the single f0 split
    assert(TreePruning.numLeaves(pruned.rootNode) == 2)
  }
}
