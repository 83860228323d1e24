package graft.operators

import graft.SparkSuite
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[DeterministicCart]]: exact split selection (brute-force
  * cross-check), total tie-break order, and — the r14 lesson — full
  * layout invariance of the q_confusion chain: the same tree and the
  * same 2×2 at ANY partition layout and ANY
  * `spark.sql.shuffle.partitions`, which is exactly what MLlib's
  * sampled-bin trainer does not provide.
  */
class DeterministicCartSpec extends SparkSuite {

  private def toDF(rows: Seq[(Array[Double], Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (xs, y) => (Vectors.dense(xs), y) }
      .toDF("features", "label")
  }

  test("pure split on the single informative feature") {
    val df = toDF(Seq(
      (Array(0.0, 1.0), 0.0), (Array(0.0, 0.0), 0.0),
      (Array(0.0, 1.0), 0.0), (Array(2.0, 0.0), 1.0),
      (Array(2.0, 1.0), 1.0), (Array(2.0, 0.0), 1.0)))
    val m = DeterministicCart.fit(df, "features", "label", maxDepth = 4)
    val root = m.rootNode
      .asInstanceOf[org.apache.spark.ml.tree.InternalNode]
    val split = root.split
      .asInstanceOf[org.apache.spark.ml.tree.ContinuousSplit]
    assert(split.featureIndex === 0)
    assert(split.threshold === 0.0)
    assert(TreePruning.numLeaves(m.rootNode) === 2)
    val preds = m.transform(df).select("label", "prediction").collect()
    assert(preds.forall(r => r.getDouble(0) === r.getDouble(1)))
  }

  test("tie-break: equal gain resolves to lowest feature, lowest value") {
    // features 1 and 2 are identical copies of feature 0's signal;
    // every candidate threshold has the same gain → split must pick
    // feature 0 (and an identical-gain tie between thresholds within
    // a feature picks the smaller value).
    val df = toDF(Seq(
      (Array(0.0, 0.0, 0.0), 0.0), (Array(0.0, 0.0, 0.0), 0.0),
      (Array(1.0, 1.0, 1.0), 1.0), (Array(1.0, 1.0, 1.0), 1.0)))
    val m = DeterministicCart.fit(df, "features", "label")
    val split = m.rootNode
      .asInstanceOf[org.apache.spark.ml.tree.InternalNode].split
      .asInstanceOf[org.apache.spark.ml.tree.ContinuousSplit]
    assert(split.featureIndex === 0)
    assert(split.threshold === 0.0)
  }

  test("root split matches brute-force exact Gini search") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(120)((
      Array.fill(5)(rnd.nextInt(4).toDouble),
      if (rnd.nextDouble() < 0.4) 1.0 else 0.0))
    val m = DeterministicCart.fit(toDF(rows), "features", "label",
      maxDepth = 1)
    def giniOf(xs: Seq[Double]): Double = {
      val n = xs.size.toDouble; val p = xs.sum
      1.0 - math.pow(p / n, 2) - math.pow((n - p) / n, 2)
    }
    val n = rows.size.toDouble
    val parent = giniOf(rows.map(_._2))
    // enumerate every (feature, threshold) exactly as the trainer
    // defines candidates: thresholds at observed values except the max
    val cands = for {
      f <- 0 until 5
      v <- rows.map(_._1(f)).distinct.sorted.dropRight(1)
    } yield {
      val (l, r) = rows.partition(_._1(f) <= v)
      val gain = parent - l.size / n * giniOf(l.map(_._2)) -
        r.size / n * giniOf(r.map(_._2))
      (gain, f, v)
    }
    // trainer order: gain desc, feature asc, value asc
    val (bg, bf, bv) = cands.maxBy { case (g, f, v) => (g, -f, -v) }
    val split = m.rootNode
      .asInstanceOf[org.apache.spark.ml.tree.InternalNode].split
      .asInstanceOf[org.apache.spark.ml.tree.ContinuousSplit]
    assert(split.featureIndex === bf)
    assert(split.threshold === bv)
    assert(bg > 0.0)
  }

  test("negative feature values: split stats match brute force " +
      "(ADVICE r18 — the value-0 group must sort into position, " +
      "not prepend)") {
    // sparse vectors with NEGATIVE nonzero values and enough zero
    // mass that the implicit zero group matters: under the r18
    // prepend, every candidate at a negative value wrongly included
    // the zero-group mass in its 'x <= v' prefix.
    val rnd = new scala.util.Random(19)
    val vals = Array(-2.0, -1.0, 0.0, 0.0, 1.0, 3.0)
    val rows = Seq.fill(150)((
      Array.fill(4)(vals(rnd.nextInt(vals.length))),
      if (rnd.nextDouble() < 0.5) 1.0 else 0.0))
    val m = DeterministicCart.fit(toDF(rows), "features", "label",
      maxDepth = 1)
    def giniOf(xs: Seq[Double]): Double = {
      val n = xs.size.toDouble; val p = xs.sum
      1.0 - math.pow(p / n, 2) - math.pow((n - p) / n, 2)
    }
    val n = rows.size.toDouble
    val parent = giniOf(rows.map(_._2))
    val cands = for {
      f <- 0 until 4
      v <- rows.map(_._1(f)).distinct.sorted.dropRight(1)
    } yield {
      val (l, r) = rows.partition(_._1(f) <= v)
      val gain = parent - l.size / n * giniOf(l.map(_._2)) -
        r.size / n * giniOf(r.map(_._2))
      (gain, f, v)
    }
    val (bg, bf, bv) = cands.maxBy { case (g, f, v) => (g, -f, -v) }
    assert(bg > 0.0)
    val split = m.rootNode
      .asInstanceOf[org.apache.spark.ml.tree.InternalNode].split
      .asInstanceOf[org.apache.spark.ml.tree.ContinuousSplit]
    assert(split.featureIndex === bf)
    assert(split.threshold === bv)
  }

  test("q_confusion chain is invariant to layout and shuffle config") {
    val dir = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(shufflePartitions: String, layout: DataFrame => DataFrame)
        : (Seq[(Double, Double, Long)], String) = {
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      try {
        val q = graft.SparkEntry.queries("q_confusion")
        // replicate the query but force a layout on the input; the
        // registered query reads parquet directly, so instead rebuild
        // the chain on a re-laid-out documents frame
        val docs = layout(graft.Tables.documents(spark, dir))
          .select(col("doc_id"), col("lang"),
            graft.functions.TextFunctions.splitWords(col("text"))
              .as("tokens"))
        val cv = new TrimmedCountVectorizer()
          .setInputCol("tokens").setOutputCol("features")
          .setMinDocFreq(2).setMinTermFreq(2)
        val featurized = cv.fit(docs).transform(docs)
          .withColumn("label", (col("lang") === "en").cast("double"))
        val (train, test) =
          StratifiedSplit.split(featurized, "label", 0.7, 32984L,
            shards = 64)
        val fitted =
          DeterministicCart.fit(train, "features", "label", maxDepth = 8)
        val model = TreePruning.pruneCp(fitted, 0.02)
        val cm = model.transform(test)
          .groupBy(col("prediction"), col("label"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("prediction"), col("label"))
          .collect()
          .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
          .toSeq
        // drop the header line — it embeds the random model uid
        (cm, model.toDebugString.linesIterator.drop(1).mkString("\n"))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val base = run("4", identity)
    val wide = run("32", _.repartition(13))
    val one = run("5", _.coalesce(1))
    val shuffled = run("32",
      _.orderBy(desc("text")).repartition(17, col("lang")))
    assert(base._2 === wide._2, "tree drifted with layout")
    assert(base._2 === one._2, "tree drifted with coalesce(1)")
    assert(base._2 === shuffled._2, "tree drifted with row order")
    assert(base._1 === wide._1)
    assert(base._1 === one._1)
    assert(base._1 === shuffled._1)
    assert(base._1.map(_._3).sum > 0L)
  }

  test("bridge nodes report the count-weighted CART gain (ADVICE r15)") {
    // parent [9,3]: gini 0.375; left [8,0]: gini 0, n=8;
    // right [1,3]: gini 0.375, n=4
    // weighted gain = 0.375 - (8/12)*0 - (4/12)*0.375 = 0.25
    // (the unweighted child mean would misreport 0.1875 in
    // featureImportances / toDebugString)
    import org.apache.spark.ml.graftbridge.TreeBridge
    val node = TreeBridge.internalOf(Array(9.0, 3.0),
      TreeBridge.leafOf(Array(8.0, 0.0)),
      TreeBridge.leafOf(Array(1.0, 3.0)), feature = 0, threshold = 0.5)
    assert(math.abs(node.gain - 0.25) < 1e-12, s"gain=${node.gain}")
  }
}
