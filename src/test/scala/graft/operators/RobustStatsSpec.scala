package graft.operators

import graft.SparkSuite

class RobustStatsSpec extends SparkSuite {
  import spark.implicits._

  test("outlier is clipped to the p-boundary, mean robust") {
    // 1..9 plus a wild 1000: p10/p90 of the 10 values bound the
    // outlier; the winsorized mean must stay near the bulk.
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1000.0))
      .toDF("g", "v")
    val r = RobustStats.winsorizedMean(df, "g", "v", 0.1, 0.9)
      .collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n_hi") === 1L) // only the outlier clipped
    // p90 of 1..9,1000 (linear interpolation) = 9 + 0.1*(1000-9)
    val p90 = 9 + 0.1 * 991
    assert(r.getAs[Long]("hi_micro") === math.round(p90 * 1e6))
    val mean = r.getAs[Long]("wmean_micro") / 1e6
    assert(mean < 20.0, s"winsorized mean not robust: $mean")
  }

  test("no clipping when values sit inside the band") {
    val df = (1 to 100).map(i => ("g", 50.0)).toDF("g", "v")
    val r = RobustStats.winsorizedMean(df, "g", "v", 0.05, 0.95)
      .collect().head
    assert(r.getAs[Long]("n_lo") === 0L && r.getAs[Long]("n_hi") === 0L)
    assert(r.getAs[Long]("wmean_micro") === 50000000L)
  }

  test("groups clip against their OWN percentiles") {
    val df = ((1 to 10).map(i => ("small", i.toDouble)) ++
      (1 to 10).map(i => ("big", i * 1000.0))).toDF("g", "v")
    val out = RobustStats.winsorizedMean(df, "g", "v", 0.1, 0.9)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("hi_micro"))
      .toMap
    assert(out("big") > out("small") * 100)
  }

  test("partitioning-invariant (integer interior)") {
    val df = (1 to 500).map(i => (s"g${i % 3}", (i * 37 % 97) / 7.0))
      .toDF("g", "v")
    val a = RobustStats
      .winsorizedMean(df.repartition(1), "g", "v", 0.05, 0.95)
      .orderBy("g").collect().toSeq
    val b = RobustStats
      .winsorizedMean(df.repartition(11), "g", "v", 0.05, 0.95)
      .orderBy("g").collect().toSeq
    assert(a === b)
  }

  test("invalid percentile band rejected") {
    val df = Seq(("g", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      RobustStats.winsorizedMean(df, "g", "v", 0.9, 0.1)
    }
  }
}
