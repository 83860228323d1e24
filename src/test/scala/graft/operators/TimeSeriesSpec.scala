package graft.operators

import graft.SparkSuite

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  test("ewmaHalf folds y=(y+x)/2 in (order, tiebreak) order") {
    val df = Seq(
      (1L, 3L, 1L, 8.0),   // deliberately out of order
      (1L, 1L, 1L, 4.0),
      (1L, 2L, 1L, 2.0),
      (2L, 1L, 1L, 7.0)
    ).toDF("k", "t", "tie", "v")
    val out = TimeSeries.ewmaHalf(df, Seq("k"), Seq("t", "tie"), "v")
      .orderBy("k").collect()
    // key 1: y=4 → (4+2)/2=3 → (3+8)/2=5.5 ; key 2: single row → 7
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq === Seq((1L, 3L, 5.5), (2L, 1L, 7.0)))
  }

  test("same-timestamp rows fall to the tiebreaker") {
    val df = Seq(
      (1L, 1L, 2L, 100.0),
      (1L, 1L, 1L, 0.0)
    ).toDF("k", "t", "tie", "v")
    val out = TimeSeries.ewmaHalf(df, Seq("k"), Seq("t", "tie"), "v")
      .collect()
    // order is (tie 1, tie 2): y=0 → (0+100)/2 = 50
    assert(out.head.getDouble(2) === 50.0)
  }

  test("result is partitioning-independent") {
    val df = (1L to 200L).map(i => (i % 7, i, i % 3, i * 0.37))
      .toDF("k", "t", "tie", "v")
    val a = TimeSeries.ewmaHalf(df, Seq("k"), Seq("t", "tie"), "v")
      .orderBy("k").collect().toSeq
    val b = TimeSeries.ewmaHalf(df.repartition(13), Seq("k"),
      Seq("t", "tie"), "v").orderBy("k").collect().toSeq
    assert(a === b)
  }

  test("holtHalf matches the hand-computed level/trend recurrence") {
    val df = Seq(
      (1L, 3L, 1L, 3.0), // deliberately out of order
      (1L, 1L, 1L, 1.0),
      (1L, 2L, 1L, 2.0),
      (2L, 1L, 1L, 7.0)
    ).toDF("k", "t", "tie", "v")
    val out = TimeSeries.holtHalf(df, Seq("k"), Seq("t", "tie"), "v")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // key 1 on [1,2,3]: l1=1,b1=0 → l=1.5,b=0.25 → l=2.375,b=0.5625
    assert(out.toSeq === Seq(
      (1L, 3L, 2.375, 0.5625, 2.9375),
      (2L, 1L, 7.0, 0.0, 7.0)))
  }

  test("holtHalf tracks a pure linear ramp with converging forecast") {
    // x_i = 10 + 2i: the one-step forecast must approach the next
    // point (EWMA would lag by a constant offset instead)
    val df = (1L to 40L).map(i => (1L, i, 1L, 10.0 + 2.0 * i))
      .toDF("k", "t", "tie", "v")
    val r = TimeSeries.holtHalf(df, Seq("k"), Seq("t", "tie"), "v")
      .collect().head
    val forecast = r.getDouble(4)
    val next = 10.0 + 2.0 * 41
    assert(math.abs(forecast - next) < 0.1,
      s"forecast $forecast should be near $next")
  }

  test("holtWintersHalf learns a pure period-4 cycle: the seasonal " +
      "forecast beats Holt's trend-only one") {
    // y cycles 10,20,30,40 — zero trend, pure seasonality
    val cyc = (0 until 40).map(i => (1L, i.toLong, 1L,
      10.0 * (i % 4) + 10.0))
    val df = cyc.toDF("k", "t", "tie", "v")
    val hw = TimeSeries.holtWintersHalf(df, Seq("k"), Seq("t", "tie"), "v")
      .collect().head
    // next obs (t=40) is slot 0 → value 10
    val hwErr = math.abs(hw.getDouble(8) - 10.0)
    val holt = TimeSeries.holtHalf(df, Seq("k"), Seq("t", "tie"), "v")
      .collect().head
    val holtErr = math.abs(holt.getDouble(4) - 10.0)
    assert(hwErr < 2.0, s"seasonal forecast off by $hwErr")
    assert(hwErr < holtErr,
      s"HW err $hwErr should beat Holt err $holtErr on a cycle")
    // slots ordered like the cycle: s0 < s1 < s2 < s3
    val slots = (4 to 7).map(hw.getDouble)
    assert(slots === slots.sorted, s"slots $slots")
  }

  test("holtWintersHalf first-obs init matches holtHalf on a " +
      "2-point series (seasonals still zero)") {
    val df = Seq((1L, 1L, 1L, 8.0), (1L, 2L, 2L, 12.0))
      .toDF("k", "t", "tie", "v")
    val hw = TimeSeries.holtWintersHalf(df, Seq("k"), Seq("t", "tie"), "v")
      .collect().head
    // l2 = .5·12 + .5·8 = 10, b2 = .5·2 = 1, s-slot1 = .5·(12−10) = 1
    assert(hw.getDouble(2) === 10.0 && hw.getDouble(3) === 1.0)
    assert(hw.getDouble(4) === 0.0 && hw.getDouble(5) === 1.0)
    // forecast t=3 → slot 2, still 0: l + b + 0 = 11
    assert(hw.getDouble(8) === 11.0)
  }

  test("saxWords: hand-checked chunk sums and letter assignment") {
    // 8 observed hours with counts [1,1,5,5,9,9,2,2] → 4 chunks of 2
    // hours: sums [2,10,18,4] → equal-frequency letters a,c,d,b
    val counts = Seq(1, 1, 5, 5, 9, 9, 2, 2)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)(("k", java.sql.Timestamp.valueOf(
        f"2024-01-01 $h%02d:30:00")))
    }
    val df = rows.toDF("key", "ts")
    val out = TimeSeries.saxWords(df, "key", "ts",
        segments = 4, alphabet = 4)
      .orderBy("segment").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
    assert(out === Seq((0, 2L, 2L, "a"), (1, 2L, 10L, "c"),
      (2, 2L, 18L, "d"), (3, 2L, 4L, "b")))
  }

  test("saxWords: fewer hours than segments emits a shorter word; " +
      "ties break by segment index; partitioning-independent") {
    val rows = Seq(0, 1, 2).flatMap(h =>
      Seq.fill(3)(("s", java.sql.Timestamp.valueOf(
        f"2024-02-01 $h%02d:15:00"))))
    val df = rows.toDF("key", "ts")
    val out = TimeSeries.saxWords(df, "key", "ts",
        segments = 8, alphabet = 3)
      .orderBy("segment").collect()
      .map(r => (r.getInt(1), r.getLong(3), r.getString(4))).toSeq
    // 3 hours → 3 non-empty chunks, equal sums → letters follow
    // segment order (the deterministic tie-break)
    assert(out.map(_._2).forall(_ == 3L) && out.size === 3)
    assert(out.map(_._3) === Seq("a", "b", "c"))
    val big = (1 to 300).map(i => (s"k${i % 3}",
      java.sql.Timestamp.valueOf(
        f"2024-03-01 ${i % 24}%02d:05:00"))).toDF("key", "ts")
    val a = TimeSeries.saxWords(big, "key", "ts", 8, 4)
      .orderBy("key", "segment").collect().toSeq
    val b = TimeSeries.saxWords(big.repartition(11), "key", "ts", 8, 4)
      .orderBy("key", "segment").collect().toSeq
    assert(a === b)
  }
}
