package graft.operators

import scala.collection.mutable

import org.apache.spark.ml.classification.DecisionTreeClassificationModel
import org.apache.spark.ml.graftbridge.TreeBridge
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.tree.Node
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact, partition-layout-invariant CART trainer for binary labels —
  * the determinism twin of the reference's `rpart` fit
  * (`/root/reference/Week5_datingNLP.R:178`).
  *
  * MLlib's `DecisionTreeClassifier` bins continuous features by
  * SAMPLING and aggregates float impurities in partition order, so the
  * fitted tree depends on the partition layout (the same seed yields
  * different trees at `local[4]` vs `local[32]` — VERDICT r14). This
  * trainer is exact instead, the [[LloydKMeans]] precedent: every
  * split decision derives from exact integer counts, so the tree — and
  * everything downstream of it — is identical at ANY parallelism or
  * row order. That also makes it rpart-faithful: rpart evaluates every
  * observed value as a split candidate (no binning).
  *
  * Per tree level, one distributed pass:
  *   1. explode the active rows' nonzero (feature, value) pairs and
  *      hash-aggregate exact `(count, positives)` per
  *      `(node, feature, value)`; the implicit value-0 group is
  *      reconstructed from node totals (sparse vectors never
  *      materialize their zeros);
  *   2. a window over `(node, feature)` ordered by value turns the
  *      group counts into prefix sums = left-child stats for the
  *      "x <= v" candidate split at every observed value;
  *   3. Gini gain is computed from those exact longs, and the best
  *      split per node is `max(struct(gain, -feature, -value))` — a
  *      lexicographic arg-max whose tie-break (gain desc, feature asc,
  *      value asc) is total, so ties cannot reintroduce
  *      nondeterminism. IEEE doubles derived from exact integers are
  *      reproducible across JVMs and layouts.
  * Only ONE ROW PER ACTIVE NODE reaches the driver (≤ 2^depth), never
  * the per-term stats — the shape scales like MLlib's own per-level
  * `aggregateByKey` (PLANET); the extra cost vs binning is bounded by
  * the number of distinct values per feature (small integers for count
  * vectors).
  *
  * The result is a stock [[DecisionTreeClassificationModel]] (built
  * via [[TreeBridge]] with exact class counts), so
  * [[TreePruning.pruneCp]] and codegen'd `transform` work unchanged.
  */
object DeterministicCart {

  // Nonzero (index, value) pairs of a sparse/dense MLlib vector: the
  // native graft.functions.vector_nonzeros kernel (round 18) — the
  // former UDF here paid a full VectorUDT deserialization plus a
  // reflection-encoded tuple conversion per row on the stats-pass
  // scan, the hottest loop of the fit.

  /** Gini impurity 1 - (p/n)^2 - ((n-p)/n)^2 from exact long counts. */
  private def gini(n: Column, p: Column): Column = {
    val nd = n.cast("double")
    lit(1.0) - pow(p.cast("double") / nd, 2) -
      pow((n - p).cast("double") / nd, 2)
  }

  /** Fit on `df(featuresCol: VectorUDT, labelCol ∈ {0, 1})`. */
  def fit(
      df: DataFrame,
      featuresCol: String,
      labelCol: String,
      maxDepth: Int = 8,
      minInfoGain: Double = 0.0): DecisionTreeClassificationModel = {
    val spark = df.sparkSession
    import spark.implicits._

    val numFeatures =
      df.select(col(featuresCol)).head.getAs[Vector](0).size
    var assign = df
      .select(col(featuresCol).as("f"), col(labelCol).cast("long").as("y"),
        lit(0).as("node"))
      .cache()

    // driver bookkeeping: exact (rows, positives) per node + split arcs
    val counts = mutable.Map.empty[Int, (Long, Long)]
    val splits = mutable.Map.empty[Int, (Int, Double, Int, Int)]
    var nextId = 1
    val rootRow = assign.agg(
      count(lit(1)).cast("long"), sum(col("y")).cast("long")).head
    counts(0) = (rootRow.getLong(0), rootRow.getLong(1))
    def impure(id: Int): Boolean = {
      val (n, p) = counts(id); p > 0L && p < n
    }
    var active: Seq[Int] = Seq(0).filter(impure)

    var depth = 0
    while (depth < maxDepth && active.nonEmpty) {
      val totals = broadcast(
        active.map(id => (id, counts(id)._1, counts(id)._2))
          .toDF("node", "n", "p"))

      val stats = assign
        .filter(col("node").isInCollection(active))
        .select(col("node"),
          explode(graft.functions.vector_nonzeros(col("f"))).as("e"),
          col("y"))
        .groupBy(col("node"), col("e._1").as("feat"), col("e._2").as("v"))
        .agg(count(lit(1)).cast("long").as("cnt"),
          sum(col("y")).cast("long").as("pos"))
      // Split search per (node, feature): the per-value stats of a
      // group collapse into ONE sorted array row, and the prefix-sum
      // + arg-max run as an in-array fold — where the previous
      // formulation shuffled the full (node, feat, v) stats table a
      // SECOND time for a window (plus a third for the node arg-max
      // over every candidate), this one's second exchange carries
      // one compact row per (node, feature) and the node arg-max
      // sees ≤ |features| rows per node. Same candidate set (the
      // implicit value-0 group is sorted into value order when the
      // node has zero mass; the rightmost prefix nl = n is skipped),
      // same gain doubles
      // (the shared gini/gain expression tree), same total order
      // (gain desc, then nv = -v within a feature, then nf = -feat
      // across features — arg-max decomposes per feature), so the
      // fitted tree is bit-identical (q_confusion + the brute-force
      // spec pin it).
      val bestStructType = "struct<gain:double,nv:double,v:double," +
        "nl:bigint,pl:bigint>"
      def gainOf(nl: Column, pl: Column): Column =
        gini(col("n"), col("p")) -
          nl.cast("double") / col("n").cast("double") * gini(nl, pl) -
          (col("n") - nl).cast("double") / col("n").cast("double") *
            gini(col("n") - nl, col("p") - pl)
      val perNF = stats
        .groupBy(col("node"), col("feat"))
        .agg(sort_array(collect_list(
            struct(col("v"), col("cnt"), col("pos")))).as("arr"),
          sum(col("cnt")).as("nzc"), sum(col("pos")).as("nzp"))
        .join(totals, "node")
      // The implicit value-0 group must land at its SORTED position,
      // not the front: features are arbitrary doubles (fit() is a
      // public API over any VectorUDT column), and for a vector with
      // negative nonzero values the zero group sits mid-array. Structs
      // compare field-by-field and `v` is distinct per (node, feat)
      // group (it was a groupBy key), so sort_array orders exactly by
      // value; for non-negative data (count vectors) zero is the
      // minimum and the array is bit-identical to the old prepend.
      val arr0 = when(col("n") > col("nzc"),
        sort_array(concat(col("arr"), array(struct(lit(0.0).as("v"),
            (col("n") - col("nzc")).as("cnt"),
            (col("p") - col("nzp")).as("pos"))))))
        .otherwise(col("arr"))
      val folded = aggregate(
        arr0,
        struct(lit(0L).as("nl"), lit(0L).as("pl"),
          lit(null).cast(bestStructType).as("best")),
        (acc, x) => {
          val nl2 = acc.getField("nl") + x.getField("cnt")
          val pl2 = acc.getField("pl") + x.getField("pos")
          val cand = struct(gainOf(nl2, pl2).as("gain"),
            (-x.getField("v")).as("nv"), x.getField("v").as("v"),
            nl2.as("nl"), pl2.as("pl"))
          val old = acc.getField("best")
          val better = when(old.isNull, cand)
            .otherwise(when(
              struct(cand.getField("gain").as("gain"),
                cand.getField("nv").as("nv")) >
                struct(old.getField("gain").as("gain"),
                  old.getField("nv").as("nv")), cand)
              .otherwise(old))
          struct(nl2.as("nl"), pl2.as("pl"),
            // rightmost prefix (nl = n) is not a split
            when(nl2 >= col("n"), old).otherwise(better).as("best"))
        })
      val best = perNF
        .select(col("node"), col("feat"), col("n"), col("p"),
          folded.getField("best").as("b"))
        .filter(col("b").isNotNull)
        .groupBy(col("node"))
        .agg(max(struct(col("b.gain").as("gain"), (-col("feat")).as("nf"),
          col("b.nv").as("nv"), col("feat"), col("b.v").as("v"),
          col("b.nl").as("nl"), col("b.pl").as("pl"))).as("b"))
        .select(col("node"), col("b.gain"), col("b.feat"), col("b.v"),
          col("b.nl"), col("b.pl"))
        .collect() // ≤ one row per active node (≤ 2^depth)

      val accepted = best.toSeq
        .map(r => (r.getInt(0), r.getDouble(1), r.getInt(2), r.getDouble(3),
          r.getLong(4), r.getLong(5)))
        .filter { case (_, g, _, _, _, _) => g > 0.0 && g >= minInfoGain }
        .sortBy(_._1) // child-id assignment independent of collect order
      if (accepted.isEmpty) {
        active = Nil
      } else {
        val children = mutable.ArrayBuffer.empty[Int]
        val levelSplits = mutable.Map.empty[Int, (Int, Double, Int, Int)]
        accepted.foreach { case (id, _, feat, v, nl, pl) =>
          val (n, p) = counts(id)
          val (l, r) = (nextId, nextId + 1); nextId += 2
          splits(id) = (feat, v, l, r)
          levelSplits(id) = (feat, v, l, r)
          counts(l) = (nl, pl)
          counts(r) = (n - nl, p - pl)
          children += l += r
        }
        // ONE map-literal lookup + ONE codegen'd vector element read
        // per row (VERDICT r17 #7), fully inside whole-stage codegen:
        // the r17 map-lookup UDF still paid a per-row VectorUDT
        // deserialization (the whole indices/values payload copied
        // into a SparseVector) plus the codegen fence; element_at on
        // the driver-small split-table literal plus
        // [[graft.functions.vector_at]] reads the single routed
        // element straight from the unsafe row. The comparison is
        // Spark SQL's `<=` (NaN greater than every double) — the
        // ORIGINAL pre-r17 when-chain semantics, restored per ADVICE
        // r17: the UDF's Scala `f(feat) <= thr` was IEEE-false on a
        // NaN threshold where SQL routes left. Feature values derive
        // from count vectors here (never NaN), so the fitted tree is
        // bit-identical either way (q_confusion re-verifies).
        val table = levelSplits.toMap
        val m = typedLit(table.map { case (id, (feat, thr, l, r)) =>
          id -> (feat, thr, l, r) })
        val e = element_at(m, col("node"))
        val routed = when(e.isNull, col("node"))
          .otherwise(when(
            graft.functions.vector_at(col("f"), e.getField("_1"))
              <= e.getField("_2"),
            e.getField("_3")).otherwise(e.getField("_4")))
        val prev = assign
        assign = assign
          .withColumn("node", routed)
          .cache()
        assign.count()
        prev.unpersist()
        active = children.toSeq.filter(impure)
      }
      depth += 1
    }
    assign.unpersist()

    def build(id: Int): Node = splits.get(id) match {
      case Some((feat, thr, l, r)) =>
        val (n, p) = counts(id)
        TreeBridge.internalOf(Array((n - p).toDouble, p.toDouble),
          build(l), build(r), feat, thr)
      case None =>
        val (n, p) = counts(id)
        TreeBridge.leafOf(Array((n - p).toDouble, p.toDouble))
    }
    val model = TreeBridge.modelOf(build(0), numFeatures, numClasses = 2)
    model.setFeaturesCol(featuresCol)
    model
  }
}
