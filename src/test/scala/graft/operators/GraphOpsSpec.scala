package graft.operators

import graft.SparkSuite

class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  test("kCore peels a pendant but keeps the triangle at k=2") {
    // triangle a-b-c, pendant d-a: round 1 drops d (deg 1), the
    // triangle is stable at residual degree 2
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"))
      .toDF("src", "dst")
    val out = GraphOps.kCore(e, "src", "dst", k = 2, rounds = 2)
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("a", 2L), ("b", 2L), ("c", 2L)))
  }

  test("kCore: cascading peel needs its rounds; dup/reversed edges " +
      "and self-loops canonicalize away") {
    // chain hanging off a triangle: x-y-z triangle, z-p, p-q, q-r.
    // round 1 drops r (and the output filter then hides q, whose
    // residual degree fell to 1); round 2 peels q so p falls too —
    // the cascade needs its rounds.
    val e = Seq(("x", "y"), ("y", "x"), ("y", "z"), ("z", "x"),
      ("z", "p"), ("p", "z"), ("p", "q"), ("q", "r"), ("q", "q"))
      .toDF("src", "dst")
    val r1 = GraphOps.kCore(e, "src", "dst", k = 2, rounds = 1)
      .collect().map(_.getString(0)).toSet
    assert(r1 === Set("x", "y", "z", "p")) // p still held up by q
    val r2 = GraphOps.kCore(e, "src", "dst", k = 2, rounds = 2)
      .collect().map(_.getString(0)).toSet
    assert(r2 === Set("x", "y", "z"))
  }

  test("bfsHops: minimum hop on a path graph, bounded by maxHops") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = GraphOps.bfsHops(e, "src", "dst", seeds, "id", maxHops = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out === Seq((1L, 0), (2L, 1), (3L, 2)))
  }

  test("bfsHops: multi-source takes the NEAREST seed; undirected " +
      "expansion reaches both endpoints of an edge") {
    // path 1-2-3-4-5-6 with seeds at both ends: 3 is 2 hops from 1,
    // 4 is 2 hops from 6 — never 3 hops
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 6L).toDF("id")
    val out = GraphOps.bfsHops(e, "src", "dst", seeds, "id", maxHops = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out === Seq((1L, 0), (2L, 1), (3L, 2), (4L, 2), (5L, 1),
      (6L, 0)))
  }

  test("results are partitioning-independent") {
    val edges = (1L to 60L).map(i => (i, (i * 7) % 60 + 1))
      .toDF("src", "dst")
    val seeds = Seq(1L, 13L).toDF("id")
    def run(e: org.apache.spark.sql.DataFrame) = (
      GraphOps.kCore(e, "src", "dst", k = 2, rounds = 3)
        .orderBy("id").collect().toSeq,
      GraphOps.bfsHops(e, "src", "dst", seeds, "id", maxHops = 3)
        .orderBy("id").collect().toSeq)
    assert(run(edges) === run(edges.repartition(7)))
  }
}
