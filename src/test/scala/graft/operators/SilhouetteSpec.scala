package graft.operators

import graft.SparkSuite

class SilhouetteSpec extends SparkSuite {
  import spark.implicits._

  // nlist=2 codebook = vectors of ids 1 and 2 (the two smallest ids)
  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("tight well-separated clusters score near 1; points between " +
      "the centroids score near 0") {
    val tight = emb(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(0.99f, 0.05f)), (4L, Seq(0.98f, 0.08f)),
      (5L, Seq(0.04f, 0.99f)), (6L, Seq(0.07f, 0.98f)))
    val out = Similarity
      .silhouetteSampledCodebook(tight, "vec_id", "embedding", nlist = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size === 2)
    out.values.foreach(s => assert(s > 0.9, s"mean silhouette $s"))
    val smeared = emb(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(0.72f, 0.70f)), (4L, Seq(0.70f, 0.72f)))
    val mixed = Similarity
      .silhouetteSampledCodebook(smeared, "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // each cell: the centroid itself (s=1) + one equidistant-ish
    // point (s near 0) → means sit well below the tight case
    mixed.foreach { case (n, s) => assert(n === 2L && s < 0.7, s"$s") }
  }

  test("deterministic under repartitioning; counts cover the corpus") {
    val vecs = emb((1L to 30L).map(i =>
      (i, Seq((math.cos(i * 0.7)).toFloat, (math.sin(i * 0.7)).toFloat))): _*)
    val a = Similarity
      .silhouetteSampledCodebook(vecs, "vec_id", "embedding", 4)
      .orderBy("cell").collect().toSeq
    val b = Similarity
      .silhouetteSampledCodebook(vecs.repartition(7), "vec_id",
        "embedding", 4)
      .orderBy("cell").collect().toSeq
    assert(a === b)
    assert(a.map(_.getLong(1)).sum === 30L)
  }

  test("nlist = 0 derives the codebook from the corpus count (the " +
      "kNN-family rule): 30 rows -> 16 cells drawn from the 16 " +
      "smallest ids, every corpus row scored exactly once") {
    val vecs = emb((1L to 30L).map(i =>
      (i, Seq(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat))): _*)
    val out = Similarity
      .silhouetteSampledCodebook(vecs, "vec_id", "embedding")
      .collect()
    assert(out.map(_.getLong(1)).sum === 30L)
    assert(out.map(_.getLong(0)).forall(c => c >= 1L && c <= 16L))
    // and it matches the explicit nlist = 16 call exactly
    val explicit = Similarity
      .silhouetteSampledCodebook(vecs, "vec_id", "embedding", nlist = 16)
      .orderBy("cell").collect().toSeq
    val derived = Similarity
      .silhouetteSampledCodebook(vecs, "vec_id", "embedding")
      .orderBy("cell").collect().toSeq
    assert(derived === explicit)
  }

  test("coarse-quantizer path: with ncoarse >= nlist the top-2 " +
      "coarse prune is lossless and must reproduce full scoring " +
      "bit-for-bit; with real pruning every row is still scored " +
      "exactly once and the result is partition-deterministic") {
    val vecs = emb((1L to 60L).map(i =>
      (i, Seq(math.cos(i * 0.31).toFloat, math.sin(i * 0.31).toFloat,
        math.cos(i * 1.7).toFloat))): _*)
    // nlist=20 > coarseThreshold=8 forces the coarse path;
    // targetCellRows=1 makes ncoarse = derivedNlist(20, 1) = 20, so
    // EVERY centroid is its own coarse cell and its own nearest
    // coarse centroid (distinct vectors — no cosine-1 ties): the
    // top-2 coarse probe selects exactly the top-2 centroids under
    // the same (cosine desc, id asc) order full scoring uses —
    // lossless by construction.
    val full = Similarity.silhouetteSampledCodebook(
        vecs, "vec_id", "embedding", nlist = 20)
      .orderBy("cell").collect().toSeq
    val coarse = Similarity.silhouetteSampledCodebook(
        vecs, "vec_id", "embedding", nlist = 20,
        targetCellRows = 1, coarseThreshold = 8)
      .orderBy("cell").collect().toSeq
    assert(coarse === full)
    // genuine pruning (ncoarse = 16 < nlist = 40): coverage + the
    // partition-determinism invariant still hold
    val pruned = Similarity.silhouetteSampledCodebook(
        vecs, "vec_id", "embedding", nlist = 40,
        targetCellRows = 3, coarseThreshold = 8)
      .orderBy("cell").collect().toSeq
    val pruned2 = Similarity.silhouetteSampledCodebook(
        vecs.repartition(7), "vec_id", "embedding", nlist = 40,
        targetCellRows = 3, coarseThreshold = 8)
      .orderBy("cell").collect().toSeq
    assert(pruned === pruned2)
    assert(pruned.map(_.getLong(1)).sum === 60L)
  }
}
