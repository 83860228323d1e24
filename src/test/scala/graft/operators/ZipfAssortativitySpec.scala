package graft.operators

import graft.SparkSuite

/** Hand-checked Zipf fits and Newman assortativity values. */
class ZipfAssortativitySpec extends SparkSuite {
  import spark.implicits._

  test("ZipfFit recovers slope -1 on an exact power law") {
    // counts 12/rank: 12, 6, 4, 3 → log-log exactly linear
    val rows =
      Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
        Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val df = rows.map(("g", _)).toDF("grp", "term")
    val r = ZipfFit.fit(df, "grp", "term").collect().head
    assert(r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - -1.0) < 1e-5, s"slope ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 1.079181) < 1e-5,
      s"intercept ${r.getDouble(3)} should be log10(12)")
    assert(r.getDouble(4) > 0.999999, s"r2 ${r.getDouble(4)}")
  }

  test("ZipfFit drops single-term groups") {
    val df = Seq(("g", "only"), ("g", "only")).toDF("grp", "term")
    assert(ZipfFit.fit(df, "grp", "term").count() === 0)
  }

  test("assortativity: star graph is perfectly disassortative (-1)") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Triangles.degreeAssortativity(edges, "src", "dst")
      .collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === -1.0)
  }

  test("assortativity: 4-node path is -0.5 (Newman's example)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Triangles.degreeAssortativity(edges, "src", "dst")
      .collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === -0.5)
  }

  test("assortativity canonicalizes duplicate and reversed edges") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val r = Triangles.degreeAssortativity(edges, "src", "dst")
      .collect().head
    assert(r.getLong(0) === 3L && r.getDouble(1) === -0.5)
  }
}
