package graft.operators

import graft.SparkSuite

class ChangeApplySpec extends SparkSuite {
  import spark.implicits._

  private val snap = Seq(
    (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"),
    (4L, "four", "b")
  ).toDF("id", "v", "src")

  test("last-writer-wins per key; delete removes; insert adds") {
    val changes = Seq(
      (2L, 1L, "U", "two-v1", "a"),
      (2L, 2L, "U", "two-v2", "a"),   // wins over seq 1
      (3L, 1L, "D", null, null),
      (9L, 1L, "I", "nine", "c")
    ).toDF("id", "seq", "op", "v", "src")
    val out = ChangeApply.applyChangeset(snap, changes, "id", "seq", "op")
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(out === Seq((1L, "one", "a"), (2L, "two-v2", "a"),
      (4L, "four", "b"), (9L, "nine", "c")))
  }

  test("update-then-delete deletes; delete-then-update resurrects") {
    val changes = Seq(
      (1L, 1L, "U", "one-v1", "a"), (1L, 2L, "D", null, null),
      (2L, 1L, "D", null, null), (2L, 2L, "U", "two-back", "a")
    ).toDF("id", "seq", "op", "v", "src")
    val out = ChangeApply.applyChangeset(snap, changes, "id", "seq", "op")
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(out === Seq((2L, "two-back", "a"), (3L, "three", "b"),
      (4L, "four", "b")))
  }

  test("unknown op code fails loudly, not silently") {
    val changes = Seq((1L, 1L, "X", "boom", "a"))
      .toDF("id", "seq", "op", "v", "src")
    val e = intercept[Exception] {
      ChangeApply.applyChangeset(snap, changes, "id", "seq", "op")
        .collect()
    }
    assert(e.getMessage.contains("unknown op code") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("unknown op code"))
  }

  test("missing payload column is rejected eagerly") {
    val changes = Seq((1L, 1L, "U", "x")).toDF("id", "seq", "op", "v")
    val e = intercept[IllegalArgumentException] {
      ChangeApply.applyChangeset(snap, changes, "id", "seq", "op")
    }
    assert(e.getMessage.contains("src"))
  }

  test("result is partitioning-invariant") {
    val changes = (1L to 50L).flatMap { i =>
      Seq((i, 1L, "U", s"v$i-1", "a"), (i, 2L, "U", s"v$i-2", "a"))
    }.toDF("id", "seq", "op", "v", "src")
    val bigSnap = (1L to 60L).map(i => (i, s"orig$i", "a"))
      .toDF("id", "v", "src")
    val a = ChangeApply
      .applyChangeset(bigSnap.repartition(1), changes.repartition(1),
        "id", "seq", "op")
      .orderBy("id").collect().toSeq
    val b = ChangeApply
      .applyChangeset(bigSnap.repartition(7), changes.repartition(13),
        "id", "seq", "op")
      .orderBy("id").collect().toSeq
    assert(a === b && a.size === 60)
  }
}
