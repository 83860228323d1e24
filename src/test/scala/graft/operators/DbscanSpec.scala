package graft.operators

import graft.SparkSuite

class DbscanSpec extends SparkSuite {
  import spark.implicits._

  private val universe = (1L to 10L).toDF("id")
  // clique {1,2,3,4}; triangle {5,6,7}; pendant 8-1; 9,10 isolated
  private val pairs = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (5L, 6L), (6L, 7L), (5L, 7L),
    (8L, 1L)
  ).toDF("a", "b")

  private def run(minPts: Int) =
    Dbscan.cluster(universe, "id", pairs, "a", "b", minPts)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq

  test("minPts 3: clique is a cluster, triangle degrades to noise, " +
      "pendant is a border of the clique") {
    val out = run(3).map(t => t._1 -> ((t._2, t._3))).toMap
    // 1 has degree 4 (clique + pendant), 2-4 have 3 → all cores
    (1L to 4L).foreach(i => assert(out(i) === ((1L, true)), s"id $i"))
    // triangle members have degree 2 < 3 and no core neighbor → noise
    (5L to 7L).foreach(i => assert(out(i) === ((-1L, false)), s"id $i"))
    assert(out(8L) === ((1L, false))) // border via core neighbor 1
    assert(out(9L) === ((-1L, false)) && out(10L) === ((-1L, false)))
  }

  test("minPts 2: the triangle becomes its own cluster") {
    val out = run(2).map(t => t._1 -> ((t._2, t._3))).toMap
    (1L to 4L).foreach(i => assert(out(i) === ((1L, true))))
    (5L to 7L).foreach(i => assert(out(i) === ((5L, true)), s"id $i"))
    assert(out(8L) === ((1L, false)))
  }

  test("an isolated core (star center) forms a singleton cluster " +
      "whose leaves are borders") {
    val u = Seq(20L, 21L, 22L, 23L).toDF("id")
    val star = Seq((20L, 21L), (20L, 22L), (20L, 23L)).toDF("a", "b")
    val out = Dbscan.cluster(u, "id", star, "a", "b", minPts = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out === Seq((20L, 20L, true), (21L, 20L, false),
      (22L, 20L, false), (23L, 20L, false)))
  }

  test("q_dbscan ε-graph candidate budget stays LINEAR in the corpus " +
      "under the derived-nlist rule (fixture, 10x, 1000x)") {
    // q_dbscan builds its ε-graph from the derived-nlist IVF-cell
    // blocking (the r14 migration off fixed nlist = 16): per cell the
    // pair join is g²/2 with g = n/nlist, so the TOTAL candidate
    // budget is nlist·g²/2 = n·g/2 ≤ n·targetCellRows/2 — linear in
    // n, where a fixed nlist is Θ(n²/nlist). sf0.1 embeddings ≈ 2000
    // rows; check the fixture scale and two orders of magnitude up.
    for (n <- Seq(2000L, 20000L, 2000000L)) {
      val nl = Similarity.derivedNlist(n)
      val meanCell = n.toDouble / nl
      assert(meanCell <= 128.0, s"n=$n nlist=$nl meanCell=$meanCell")
      val pairBudget = nl.toDouble * meanCell * meanCell / 2.0
      assert(pairBudget <= n.toDouble * 64.0,
        s"pair budget $pairBudget superlinear at n=$n (nlist=$nl)")
    }
  }

  test("clustering is partitioning-independent") {
    val a = run(3)
    val b = Dbscan.cluster(universe.repartition(5), "id",
        pairs.repartition(3), "a", "b", 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(a === b)
  }
}
