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
}
