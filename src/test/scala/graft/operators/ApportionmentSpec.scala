package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ApportionmentSpec extends SparkSuite {
  import spark.implicits._

  test("hand case: remainders decide the leftover seats") {
    // weights 5,3,2 (T=10), budget 7: exact shares 3.5, 2.1, 1.4 →
    // floors 3,2,1 (sum 6), one leftover seat → largest remainder
    // (0.5 → a) takes it: 4,2,1
    val w = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("g", "n")
    val out = Apportionment.largestRemainder(w, "g", "n", 7L)
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 5L, 4L), ("b", 3L, 2L), ("c", 2L, 1L)))
  }

  test("quotas always sum exactly to the budget") {
    for (budget <- Seq(0L, 1L, 17L, 97L, 1000L)) {
      val w = (1L to 23L).map(i => (s"g$i", i * 13 % 7 + 1))
        .toDF("g", "n")
      val total = Apportionment.largestRemainder(w, "g", "n", budget)
        .agg(sum("quota")).collect().head.getLong(0)
      assert(total === budget, s"budget $budget")
    }
  }

  test("remainder ties break on the group key ascending") {
    // equal weights, budget not divisible: the EARLIER keys get the
    // extra seats
    val w = Seq(("d", 1L), ("c", 1L), ("b", 1L), ("a", 1L))
      .toDF("g", "n")
    val out = Apportionment.largestRemainder(w, "g", "n", 6L)
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 1L, 2L), ("b", 1L, 2L), ("c", 1L, 1L),
      ("d", 1L, 1L)))
  }

  test("proportionality: quota within 1 of the exact share") {
    val w = Seq(("a", 990L), ("b", 9L), ("c", 1L)).toDF("g", "n")
    val out = Apportionment.largestRemainder(w, "g", "n", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("a") === 99L && out("b") === 1L && out("c") === 0L)
  }
}
