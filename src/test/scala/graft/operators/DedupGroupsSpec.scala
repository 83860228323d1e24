package graft.operators

import graft.SparkSuite

/** Min-label propagation over duplicate pairs. */
class DedupGroupsSpec extends SparkSuite {
  import spark.implicits._

  test("connected components label every node with its group minimum") {
    // a path (worst diameter), a clique-ish triangle, and a lone pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),        // path 1-2-3-4
      (20L, 21L), (21L, 22L), (20L, 22L),  // triangle
      (10L, 11L)                           // pair
    ).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(labels.toSeq == Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }
}
