package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ChangePointSpec extends SparkSuite {
  import spark.implicits._

  test("cusum finds a level shift at its exact index") {
    // series a: [1,1,1,5,5,5] — n=6, Σx=18; n·S_i = 6·ps_i − i·18
    // = [−12,−24,−36,−24,−12] for i=1..5; argmax |·| at i=3
    val df = (1 to 6).map(i => ("a", i.toLong, if (i <= 3) 1L else 5L))
      .toDF("s", "i", "x")
    val out = ChangePoint.cusum(df, "s", "i", "x").collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 3L)    // change_idx
    assert(out.head.getLong(2) === -36L)  // ns_dev (ran below mean)
    assert(out.head.getLong(3) === 6L)    // n
  }

  test("cusum tie breaks to the earliest index; short series drop") {
    // symmetric series [2,0,0,2]: n·S = [4,−4,−12? ] compute:
    // Σ=4, ps=[2,2,2]; nS_i = 4·ps−4i = [4,0,−4] → |4| ties at i=1,3
    val df = Seq(("t", 1L, 2L), ("t", 2L, 0L), ("t", 3L, 0L),
      ("t", 4L, 2L), ("solo", 1L, 9L)).toDF("s", "i", "x")
    val out = ChangePoint.cusum(df, "s", "i", "x").collect()
    assert(out.length === 1) // "solo" (n=1) dropped
    assert(out.head.getString(0) === "t")
    assert(out.head.getLong(1) === 1L)
  }

  test("autocorr matches the hand-computed lattice value") {
    // x = [1,2,3,4]: r_1 = 0.25 exactly (num·n² = 20, den·n² = 80)
    val df = (1 to 4).map(i => ("a", i.toLong, i.toLong)).toDF("s", "i", "x")
    val out = ChangePoint.autocorr(df, "s", "i", "x", maxLag = 2)
      .orderBy("lag").collect()
    assert(out.length === 2)
    assert(out.head.getLong(1) === 1L)
    assert(out.head.getLong(3) === 250000L) // r_1 = 0.25
    // r_2: pairs (1,3),(2,4): sxy=3+8=11, sh=3, st=7;
    // num = 16·11 − 4·10·10 + 2·100 = −24; r_2 = −24/80 = −0.3
    assert(out.last.getLong(3) === -300000L)
  }

  test("autocorr drops zero-variance series") {
    val df = (1 to 5).map(i => ("c", i.toLong, 7L)).toDF("s", "i", "x")
    assert(ChangePoint.autocorr(df, "s", "i", "x", 2).count() === 0L)
  }
}
