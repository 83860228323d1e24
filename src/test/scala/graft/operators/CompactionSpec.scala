package graft.operators

import graft.SparkSuite

class CompactionSpec extends SparkSuite {
  import spark.implicits._

  test("files split on the exclusive-prefix boundary") {
    // sizes 600,600,600,600 with target 1000: prefixes 0,600,1200,1800
    // → files 0,0,1,1
    val df = (1L to 4L).map(i => ("p", i, 600L)).toDF("part", "id", "sz")
    val plan = Compaction.plan(df, "part", "id", "sz", 1000L)
      .orderBy("file_idx").collect()
    assert(plan.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq === Seq((0L, 2L, 1200L), (1L, 2L, 1200L)))
  }

  test("oversized record still lands in exactly one file") {
    val df = Seq(("p", 1L, 5000L), ("p", 2L, 10L)).toDF("part", "id", "sz")
    val plan = Compaction.plan(df, "part", "id", "sz", 1000L)
      .orderBy("file_idx").collect()
    // record 1: prefix 0 → file 0; record 2: prefix 5000 → file 5
    assert(plan.map(_.getLong(1)).toSeq === Seq(0L, 5L))
  }

  test("partitions plan independently and nulls count as zero") {
    val df = Seq(("a", 1L, Some(900L)), ("a", 2L, None),
      ("a", 3L, Some(200L)), ("b", 1L, Some(100L)))
      .toDF("part", "id", "sz")
    val plan = Compaction.plan(df, "part", "id", "sz", 1000L)
      .orderBy("part", "file_idx").collect()
    // a: prefixes 0, 900, 900 → all file 0; b independent file 0
    assert(plan.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq(("a", 0L, 3L), ("b", 0L, 1L)))
  }

  test("plan is a pure function of the data: repartition-invariant") {
    val df = (1L to 100L).map(i => (s"p${i % 3}", i, i * 37 % 500))
      .toDF("part", "id", "sz")
    val a = Compaction.plan(df.repartition(1), "part", "id", "sz", 800L)
      .orderBy("part", "file_idx").collect().toSeq
    val b = Compaction.plan(df.repartition(17), "part", "id", "sz", 800L)
      .orderBy("part", "file_idx").collect().toSeq
    assert(a === b)
  }

  test("non-positive target is rejected") {
    val df = Seq(("p", 1L, 1L)).toDF("part", "id", "sz")
    intercept[IllegalArgumentException] {
      Compaction.plan(df, "part", "id", "sz", 0L)
    }
  }
}
