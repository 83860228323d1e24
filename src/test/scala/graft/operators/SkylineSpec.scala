package graft.operators

import graft.SparkSuite

/** Hand-checked 2-D Pareto frontiers (max x, min y). */
class SkylineSpec extends SparkSuite {
  import spark.implicits._

  test("frontier keeps exactly the non-dominated points") {
    val pts = Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 2L, 2L),
      (4L, 3L, 2L), (5L, 3L, 5L), (6L, 5L, 4L))
      .toDF("id", "x", "y")
    val got = Skyline.frontier(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // (2,3) dominated by (3,2); (2,2) dominated by (3,2); (3,5) by (5,4)
    assert(got === Set((1L, 1L, 1L), (4L, 3L, 2L), (6L, 5L, 4L)))
  }

  test("equal (x, y) rows do not dominate each other — both survive") {
    val pts = Seq((1L, 3L, 2L), (2L, 3L, 2L), (3L, 1L, 5L))
      .toDF("id", "x", "y")
    val got = Skyline.frontier(pts, "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("a single point is its own frontier") {
    val pts = Seq((7L, 4L, 4L)).toDF("id", "x", "y")
    assert(Skyline.frontier(pts, "x", "y").count() === 1)
  }
}
