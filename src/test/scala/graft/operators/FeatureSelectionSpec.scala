package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** FeatureSelection: closed-form MI on a hand-checkable corpus,
  * zero MI for class-independent terms, absent-cell inclusion, and
  * partitioning independence.
  */
class FeatureSelectionSpec extends SparkSuite {
  import spark.implicits._

  // 4 docs, 2 balanced classes. "pure" appears exactly in class A
  // docs (perfect predictor, MI = log10(2) ≈ 0.30103); "every" is in
  // all docs (MI 0); "solo" is only in one A doc.
  private lazy val docs = Seq(
    (0L, "pure every solo", "A"),
    (1L, "pure every", "A"),
    (2L, "every noise", "B"),
    (3L, "every other", "B"))
    .toDF("id", "text", "cls")

  private def mi: Map[String, (Long, Double)] =
    FeatureSelection.mutualInformation(docs, "id", "text", "cls")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("perfect predictor scores log10(2); uniform term scores 0") {
    val m = mi
    assert(m("pure")._1 == 2L)
    assert(math.abs(m("pure")._2 - 0.30103) < 1e-6)
    assert(m("every") == ((4L, 0.0)))
  }

  test("absent cells contribute: single-doc term has positive MI") {
    // solo: present (1,A); absent cells (1 A-doc, 2 B-docs) all carry
    // information about the class split.
    val m = mi
    assert(m("solo")._1 == 1L)
    assert(m("solo")._2 > 0.0)
    // hand replay on the 9-dp/6-dp lattice
    def cell(a: Long, rt: Long, ct: Long, n: Long): BigDecimal =
      if (a == 0) BigDecimal(0)
      else BigDecimal(
        (a.toDouble / n) * math.log10((a.toDouble * n) / (rt.toDouble * ct)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = (cell(1, 1, 2, 4) + cell(1, 3, 2, 4) +
      cell(0, 1, 2, 4) + cell(2, 3, 2, 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(m("solo")._2 - expected) < 1e-9)
  }

  test("repartitioning does not perturb MI") {
    val base = mi
    val got = FeatureSelection.mutualInformation(
        docs.repartition(5, col("text")), "id", "text", "cls")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == base)
  }
}
