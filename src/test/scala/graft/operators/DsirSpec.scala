package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Dsir: target-like documents outrank raw-like ones, weights match a
  * closed-form replay, and the result is partitioning-independent.
  */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  // Target slice (t=true) speaks "alpha beta"; the raw remainder
  // speaks "gamma delta". A raw doc written in target language must
  // outscore its raw-language peers.
  private lazy val docs = Seq(
    (0L, "alpha beta alpha", true),
    (1L, "beta alpha beta", true),
    (2L, "gamma delta gamma", false),
    (3L, "delta gamma delta", false),
    (4L, "alpha beta beta", false), // target-like raw doc
    (5L, "gamma delta delta", false))
    .toDF("id", "text", "is_target")

  private def weights: Map[Long, Double] =
    Dsir.importanceWeights(docs, "id", "text", col("is_target"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap

  test("target-language docs score above raw-language docs") {
    val w = weights
    assert(w(4L) > w(2L))
    assert(w(4L) > w(3L))
    assert(w(4L) > w(5L))
    assert(w(0L) > w(2L)) // calibration diagonal: targets score high
  }

  test("weights match the closed-form add-one log-ratio") {
    // corpus: alpha 4, beta 5, gamma 4, delta 5 (rtot 18); target:
    // alpha 3, beta 3 (ttot 6); vocab 4.
    def lr(tc: Long, rc: Long): Double =
      BigDecimal(math.log10((tc + 1.0) / (6 + 4)) -
        math.log10((rc + 1.0) / (18 + 4)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected0 = BigDecimal(2 * lr(3, 4) + lr(3, 5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(weights(0L) - expected0) < 1e-9)
  }

  test("repartitioning does not perturb any weight") {
    val base = weights
    val shuffled = Dsir.importanceWeights(
        docs.repartition(7, col("text")), "id", "text", col("is_target"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(shuffled == base)
  }
}
