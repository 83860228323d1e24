package graft.operators

import graft.SparkSuite

class SurvivalSpec extends SparkSuite {
  import spark.implicits._

  test("textbook KM: censoring keeps subjects in earlier risk sets") {
    // durations (event): 1(e), 2(c), 3(e), 4(e), 5(c)
    // t=1: n=5, d=1 → S=4/5=0.8
    // t=3: n=3, d=1 → S=0.8·(2/3)
    // t=4: n=2, d=1 → S=0.8·(2/3)·(1/2)
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L))
      .toDF("duration", "event")
    val out = Survival.curves(df, "duration", "event")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((1L, 5L, 1L), (3L, 3L, 1L), (4L, 2L, 1L)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val f1 = BigDecimal(1.0 - 1.0 / 5.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val f3 = BigDecimal(1.0 - 1.0 / 3.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0)._4 === r6(f1))
    assert(out(1)._4 === r6(f1 * f3))
    assert(out(2)._4 === r6(f1 * f3 * 0.5))
    // Nelson-Aalen: 1/5, +1/3, +1/2
    assert(out(0)._5 === 0.2)
    assert(math.abs(out(1)._5 - (0.2 + 1.0 / 3.0)) < 1e-6)
    assert(math.abs(out(2)._5 - (0.2 + 1.0 / 3.0 + 0.5)) < 1e-6)
  }

  test("all-event data reduces to the empirical survival function") {
    val df = (1L to 10L).map(i => (i, 1L)).toDF("duration", "event")
    val out = Survival.curves(df, "duration", "event")
      .orderBy("t").collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) === 10L - i) // risk set shrinks by one
      assert(math.abs(r.getDouble(3) - (9.0 - i) / 10.0) < 1e-6,
        s"step $i km ${r.getDouble(3)}")
    }
  }

  test("curves are partitioning-independent") {
    val df = (1L to 200L).map(i => (i % 17 + 1, (i % 3 == 0).compare(false).toLong))
      .toDF("duration", "event")
    val a = Survival.curves(df, "duration", "event")
      .orderBy("t").collect().toSeq
    val b = Survival.curves(df.repartition(9), "duration", "event")
      .orderBy("t").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("logRank: hand-computed hypergeometric sums on a censored " +
      "fixture; identical cohorts read z = 0; one-cohort partitions " +
      "drop") {
    import org.apache.spark.sql.functions.col
    // A: events at 1, 3; B: event at 2, CENSORED at 4.
    // E_B = 2/4 + 2/3 + 1/2 -> e_b_nano = 1666666667
    // V   = 1/4 + 2/9 + 1/4 -> v_nano  = 722222222
    val hand = Seq(("h", false, 1L, 1L), ("h", false, 3L, 1L),
      ("h", true, 2L, 1L), ("h", true, 4L, 0L))
    // identical cohorts: every event time splits evenly
    val same = (1L to 4L).flatMap(t =>
      Seq(("s", false, t, 1L), ("s", true, t, 1L)))
    val lone = Seq(("l", true, 1L, 1L), ("l", true, 2L, 1L))
    val out = Survival.logRank(
        (hand ++ same ++ lone).toDF("p", "b", "dur", "ev"),
        "p", col("b"), "dur", "ev")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("h").getLong(3) === 1L, s"${out("h")}")
    assert(out("h").getLong(4) === 1666666667L, s"${out("h")}")
    assert(out("h").getLong(5) === 722222222L, s"${out("h")}")
    val expZ = math.round((1.0 - (0.0 + 1666666667.0 / 1e9)) /
      math.sqrt(722222222.0 / 1e9) * 1e6)
    assert(out("h").getLong(6) === expZ, s"${out("h")} vs $expZ")
    assert(out("s").getLong(6) === 0L, s"${out("s")}")
    assert(!out.contains("l"), "one-cohort partition has no test")
  }

  test("rmst: hand-computed KM areas — full follow-up, censoring, " +
      "and a horizon before the first event") {
    // events at 2 and 4, no censoring: km = 1 on [0,2), 0.5 on
    // [2,4), 0 after → RMST(10) = 1·2 + 0.5·2 + 0·6 = 3
    val full = Seq((2L, 1L), (4L, 1L)).toDF("dur", "ev")
    val f = Survival.rmst(full, "dur", "ev", tau = 10L).collect().head
    assert(f.getLong(0) === 10L && f.getLong(1) === 2L)
    assert(f.getDouble(2) === 3.0, s"$f")
    // event at 2, censored at 4: km = 0.5 from t=2 on, never 0 →
    // RMST(6) = 1·2 + 0.5·4 = 4 (the censored subject keeps paying)
    val cens = Seq((2L, 1L), (4L, 0L)).toDF("dur", "ev")
    val c = Survival.rmst(cens, "dur", "ev", tau = 6L).collect().head
    assert(c.getLong(1) === 1L && c.getDouble(2) === 4.0, s"$c")
    // horizon before the first event: the whole area is km=1
    val late = Seq((5L, 1L)).toDF("dur", "ev")
    val l = Survival.rmst(late, "dur", "ev", tau = 3L).collect().head
    assert(l.getDouble(2) === 3.0, s"$l")
    // no events at all → no steps → empty, not a fabricated row
    val none = Seq((5L, 0L)).toDF("dur", "ev")
    assert(Survival.rmst(none, "dur", "ev", tau = 3L).count() === 0L)
  }
}
