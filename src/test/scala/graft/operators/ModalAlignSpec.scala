package graft.operators

import graft.SparkSuite

class ModalAlignSpec extends SparkSuite {
  import spark.implicits._

  // Hand-built towers: left 0 pairs with right 10 (identical
  // direction), left 2's favorite is right 10 too — but right 10
  // prefers left 0, so (2,10) must NOT survive the mutual filter.
  private val left = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (4L, Array(0.0f, 1.0f, 0.0f))
  ).toDF("id", "vec")
  private val right = Seq(
    (10L, Array(1.0f, 0.0f, 0.0f)),
    (11L, Array(0.0f, 0.95f, 0.05f)),
    (12L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("id", "vec")

  test("keeps only mutual-best pairs") {
    val out = ModalAlign.mutualTop1(left, right, "id", "vec")
      .orderBy("left_id").collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs === Seq((0L, 10L), (4L, 11L)))
    assert(!pairs.contains((2L, 10L)),
      "one-directional favorite must be dropped")
  }

  test("cosine is the 6-dp lattice value of the matched pair") {
    val out = ModalAlign.mutualTop1(left, right, "id", "vec")
      .orderBy("left_id").collect()
    assert(out.head.getDouble(2) === 1.0) // (0,10): identical direction
  }

  test("empty side yields empty alignment") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    assert(ModalAlign.mutualTop1(left, empty, "id", "vec").count() === 0L)
  }

  test("mutualTop1Blocked with nlist=1 (single cell) equals the " +
      "exact brute kernel") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("left_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(
      key(ModalAlign.mutualTop1Blocked(left, right, "id", "vec",
        nlist = 1))
        === key(ModalAlign.mutualTop1(left, right, "id", "vec")))
  }

  test("mutualTop1Blocked: a pair split across cells cannot match") {
    // nlist=6 makes every fixture row a centroid; left 4 sits in its
    // own cell while right 11 keeps cell 11, so the (4, 11) mutual
    // pair of the exact kernel disappears — blocked semantics are
    // same-cell only, by design.
    val out = ModalAlign.mutualTop1Blocked(left, right, "id", "vec",
        nlist = 6)
      .orderBy("left_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.contains((0L, 10L)), s"same-cell mutual pair lost: $out")
    assert(!out.contains((4L, 11L)),
      s"cross-cell pair must not survive blocking: $out")
  }
}
