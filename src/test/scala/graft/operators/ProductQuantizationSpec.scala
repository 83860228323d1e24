package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSuite {
  import spark.implicits._

  // Two tight clusters in 8-dim space, well separated on every dim.
  private def corpus = (0L until 40L).map { i =>
    val base = if (i % 2 == 0) 0.0f else 10.0f
    val jitter = (i % 5).toFloat * 0.01f
    (i, Array.fill(8)(base + jitter))
  }.toDF("vec_id", "embedding")

  test("subCodebooks: m x ksub entries from the smallest donor ids") {
    val cb = ProductQuantization
      .subCodebooks(corpus, "vec_id", "embedding", m = 4, ksub = 8)
      .collect()
    assert(cb.length === 32)
    assert(cb.map(_.getInt(1)).toSet === (0 until 8).toSet)
    assert(cb.forall(_.getSeq[Float](2).length === 2))
  }

  test("encode assigns every (id, subspace) exactly one in-range code") {
    val enc = ProductQuantization
      .encode(corpus, "vec_id", "embedding", m = 4, ksub = 8)
    assert(enc.count() === 160) // 40 ids x 4 subspaces
    val bad = enc.filter(col("code") < 0 || col("code") >= 8).count()
    assert(bad === 0)
    assert(enc.groupBy("id", "j").count().filter(col("count") =!= 1)
      .count() === 0)
  }

  test("adcTopK retrieves same-cluster neighbors first") {
    val queries = corpus.filter(col("vec_id") < 2) // one per cluster
    val out = ProductQuantization
      .adcTopK(queries, corpus, "vec_id", "embedding", k = 5,
        m = 4, ksub = 8)
      .collect()
    assert(out.length === 10)
    // every neighbor shares the query's cluster parity, at distance
    // far below the cross-cluster gap
    assert(out.forall(r =>
      (r.getLong(1) % 2) === (r.getLong(0) % 2)))
    // ranks are 1..5 per query, distances non-decreasing in rank
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to 5))
      val dists = sorted.map(_.getLong(2))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
  }

  test("adcTopK is deterministic and partitioning-independent") {
    val queries = corpus.filter(col("vec_id") < 3)
    val a = ProductQuantization
      .adcTopK(queries, corpus, "vec_id", "embedding", 4, 2, 8)
      .collect().map(_.toSeq).toSet
    val b = ProductQuantization
      .adcTopK(queries.repartition(3), corpus.repartition(7),
        "vec_id", "embedding", 4, 2, 8)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("ivfPqTopK agrees with full-scan ADC on an easy corpus") {
    // nprobe = nlist: cell blocking drops nothing, so IVF-PQ must
    // reproduce the full ADC ranking exactly
    val queries = corpus.filter(col("vec_id") < 2)
    val full = ProductQuantization
      .adcTopK(queries, corpus, "vec_id", "embedding", 5, 4, 8)
      .collect().map(_.toSeq).toSet
    val ivf = ProductQuantization
      .ivfPqTopK(queries, corpus, "vec_id", "embedding", 5,
        nlist = 8, nprobe = 8, m = 4, ksub = 8)
      .collect().map(_.toSeq).toSet
    assert(ivf === full)
  }

  test("euclideanTopK ranks the exact nearest neighbors") {
    val out = Similarity
      .euclideanTopK(corpus.filter(col("vec_id") === 0), corpus,
        "vec_id", "embedding", 3)
      .collect()
    assert(out.length === 3)
    // nearest to vec 0 (jitter 0.00) are the even ids with the
    // smallest jitter gaps — all same-cluster
    assert(out.forall(_.getLong(1) % 2 === 0L))
    val dists = out.sortBy(_.getInt(3)).map(_.getLong(2))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
  }

  test("dimension not divisible by m is rejected") {
    val e = intercept[IllegalArgumentException] {
      ProductQuantization.encode(corpus, "vec_id", "embedding", 3, 4)
        .count()
    }
    assert(e.getMessage.contains("divisible"))
  }
}
