package graft.operators

import graft.SparkSuite

/** Hand-checked join-cardinality profiles and kNN label-noise. */
class JoinCardinalityNoiseSpec extends SparkSuite {
  import spark.implicits._

  test("joinCardinality: exact output size from the histograms") {
    val left = Seq(1L, 1L, 1L, 2L, 3L, 4L).toDF("k")
    val right = Seq(1L, 1L, 2L, 2L, 2L, 9L).toDF("k2")
    val r = DataQuality.joinCardinality(left, "k", right, "k2")
      .collect().head
    // key 1: 3·2 = 6 rows, key 2: 1·3 = 3; keys 3, 4, 9 unmatched
    assert(r.getLong(0) === 2L)      // n_keys
    assert(r.getLong(1) === 9L)      // join_rows
    assert(r.getLong(2) === 6L)      // max_key_rows
    assert(r.getLong(3) === 666666L) // floor(6e6/9)
    // cross-check against the actual join
    assert(left.join(right, left("k") === right("k2")).count() === 9L)
  }

  test("joinCardinality ignores null keys, like the join itself") {
    val left = Seq(Some(1L), None, None).toDF("k")
    val right = Seq(Some(1L), None).toDF("k2")
    val r = DataQuality.joinCardinality(left, "k", right, "k2")
      .collect().head
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L)
  }

  test("labelNoise flags the planted mislabel and only it") {
    // three 4-member clusters on axes; vec 3 sits in cluster a but
    // carries label b — with k=3 each row's neighbors are its own
    // cluster, so only vec 3 is outvoted
    def v(x: Double, y: Double, z: Double) = Array(x, y, z)
    val rows = Seq(
      (0L, v(1, 0, 0), "a"), (1L, v(0.9, 0.1, 0), "a"),
      (2L, v(0.95, 0.05, 0), "a"),
      (3L, v(0.92, 0.08, 0), "b"), // mislabeled
      (4L, v(0, 1, 0), "b"), (5L, v(0.1, 0.9, 0), "b"),
      (6L, v(0.05, 0.95, 0), "b"), (7L, v(0.08, 0.92, 0), "b"),
      (8L, v(0, 0, 1), "c"), (9L, v(0, 0.1, 0.9), "c"),
      (10L, v(0, 0.05, 0.95), "c"), (11L, v(0, 0.08, 0.92), "c"))
      .toDF("vec_id", "embedding", "label")
    val out = KnnClassifier.labelNoise(
        rows, "vec_id", "embedding", "label", 3)
      .collect()
    assert(out.map(_.getLong(0)).toSet === Set(3L),
      s"expected only vec 3, got ${out.mkString(";")}")
    val r = out.head
    assert(r.getString(1) === "b" && r.getString(2) === "a")
    assert(r.getLong(3) === 3L) // all three neighbors vote a
  }
}
