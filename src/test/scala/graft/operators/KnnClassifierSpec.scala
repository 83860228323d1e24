package graft.operators

import graft.SparkSuite

class KnnClassifierSpec extends SparkSuite {
  import spark.implicits._

  // Two tight clusters on orthogonal axes plus a mixed-vote probe.
  private def labeled = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 10),
    (2L, Array(0.9f, 0.1f, 0.0f), 10),
    (3L, Array(0.95f, 0.05f, 0.0f), 10),
    (4L, Array(0.0f, 1.0f, 0.0f), 20),
    (5L, Array(0.1f, 0.9f, 0.0f), 20),
    (6L, Array(0.05f, 0.95f, 0.0f), 20)
  ).toDF("vec_id", "embedding", "label")

  test("propagates the nearest cluster's label") {
    val unlabeled = Seq(
      (100L, Array(0.98f, 0.02f, 0.0f)),
      (200L, Array(0.02f, 0.98f, 0.0f))
    ).toDF("vec_id", "embedding").withColumn("label",
      org.apache.spark.sql.functions.lit(-1))
    val out = KnnClassifier.classify(
        unlabeled, labeled, "vec_id", "embedding", "label", 3)
      .orderBy("query_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((100L, 10), (200L, 20)))
    assert(out.forall(_.getLong(2) == 3L)) // unanimous votes
    assert(out.forall(_.getInt(3) == 1))   // winner owns rank 1
  }

  test("vote count ties break on the smallest label") {
    // k=2 with one neighbor from each cluster: 1-1 tie → label 10.
    val unlabeled = Seq((300L, Array(0.7f, 0.7f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = KnnClassifier.classify(
        unlabeled, labeled, "vec_id", "embedding", "label", 2)
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 1L)
    assert(out.head.getInt(1) === 10)
  }

  test("one row per query, even with k larger than the labeled set") {
    val unlabeled = Seq(
      (400L, Array(1.0f, 0.0f, 0.0f)),
      (500L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = KnnClassifier.classify(
        unlabeled, labeled, "vec_id", "embedding", "label", 50)
      .collect()
    assert(out.map(_.getLong(0)).sorted.toSeq === Seq(400L, 500L))
  }
}
