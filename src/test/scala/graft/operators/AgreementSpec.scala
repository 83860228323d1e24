package graft.operators

import graft.SparkSuite

class AgreementSpec extends SparkSuite {
  import spark.implicits._

  test("hand case matches the textbook kappa") {
    // classic 2x2: a=yes/yes 20, yes/no 5, no/yes 10, no/no 15
    // po = 35/50 = 0.70; pe = (25*30 + 25*20)/2500 = 0.50
    // kappa = (0.70-0.50)/(1-0.50) = 0.40
    val df = (Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n")))
      .toDF("a", "b")
    val r = Agreement.cohensKappa(df, "a", "b").collect().head
    assert(r.getAs[Long]("n") === 50L)
    assert(r.getAs[Long]("po_ppm") === 700000L)
    assert(r.getAs[Long]("pe_ppm") === 500000L)
    assert(r.getAs[Long]("kappa_ppm") === 400000L)
  }

  test("perfect agreement gives kappa 1; worse-than-chance negative") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(Agreement.cohensKappa(perfect, "a", "b")
      .collect().head.getAs[Long]("kappa_ppm") === 1000000L)
    // systematic disagreement on balanced classes → negative kappa
    val anti = (Seq.fill(10)(("y", "n")) ++ Seq.fill(10)(("n", "y")))
      .toDF("a", "b")
    assert(Agreement.cohensKappa(anti, "a", "b")
      .collect().head.getAs[Long]("kappa_ppm") < 0L)
  }

  test("null labels are excluded from the pair stream") {
    val df = Seq((Some("y"), Some("y")), (None, Some("y")),
      (Some("y"), None), (Some("n"), Some("n"))).toDF("a", "b")
    val r = Agreement.cohensKappa(df, "a", "b").collect().head
    assert(r.getAs[Long]("n") === 2L && r.getAs[Long]("agree") === 2L)
  }

  test("result is partitioning-invariant (integer interior)") {
    val df = (1 to 300)
      .map(i => (s"l${i % 4}", s"l${(i * 7) % 4}")).toDF("a", "b")
    val one = Agreement.cohensKappa(df.repartition(1), "a", "b")
      .collect().head.toSeq
    val many = Agreement.cohensKappa(df.repartition(17), "a", "b")
      .collect().head.toSeq
    assert(one === many)
  }
}
