package graft.operators

import graft.SparkSuite

class GroupedOlsSpec extends SparkSuite {
  import spark.implicits._

  test("recovers an exact linear relation per group") {
    // group a: y = 3x + 2 exactly; group b: y = -x + 10 exactly
    val df = ((1L to 10L).map(x => ("a", x, 3 * x + 2)) ++
      (1L to 10L).map(x => ("b", x, -x + 10))).toDF("g", "x", "y")
    val out = GroupedOls.fit(df, "g", "x", "y").orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(2), r.getDouble(3),
      r.getDouble(4))).toSeq ===
      Seq(("a", 3.0, 2.0, 1.0), ("b", -1.0, 10.0, 1.0)))
  }

  test("noisy relation: slope between the extremes, r2 below 1") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 3L), ("g", 3L, 2L),
      ("g", 4L, 5L)).toDF("g", "x", "y")
    val out = GroupedOls.fit(df, "g", "x", "y").collect().head
    assert(out.getDouble(2) > 0 && out.getDouble(4) < 1.0)
  }

  test("degenerate groups are excluded; constant y yields null r2") {
    val df = Seq(
      ("const_x", 5L, 1L), ("const_x", 5L, 2L),   // zero x variance
      ("single", 1L, 1L),                          // one row
      ("const_y", 1L, 7L), ("const_y", 2L, 7L)     // zero y variance
    ).toDF("g", "x", "y")
    val out = GroupedOls.fit(df, "g", "x", "y").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("const_y"))
    assert(out.head.getDouble(2) === 0.0)  // flat line
    assert(out.head.isNullAt(4))           // r2 undefined
  }

  test("fractional input without a scale is rejected, not truncated") {
    val df = Seq(("g", 0.1, 1.0), ("g", 0.2, 2.0)).toDF("g", "x", "y")
    val e = intercept[IllegalArgumentException] {
      GroupedOls.fit(df, "g", "x", "y")
    }
    assert(e.getMessage.contains("scale"))
  }

  test("fractional input with a scale recovers the relation in " +
    "original units") {
    // y = 0.5x + 0.25 exactly on a 1/1000 lattice
    val df = (1 to 10).map { i =>
      val x = i / 4.0; ("g", x, 0.5 * x + 0.25)
    }.toDF("g", "x", "y")
    val out = GroupedOls.fit(df, "g", "x", "y", scale = 1000L)
      .collect().head
    assert(out.getDouble(2) === 0.5)   // slope unit-free
    assert(out.getDouble(3) === 0.25)  // intercept divided back to units
    assert(out.getDouble(4) === 1.0)
  }
}
