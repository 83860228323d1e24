package graft.operators

import graft.SparkSuite

class ConformalSpec extends SparkSuite {
  import spark.implicits._

  // y = 3x + noise with |noise| <= 5 by construction; roles dealt
  // round-robin so every split sees the same noise profile
  private def rows(g: String, n: Int) =
    (1 to n).map { i =>
      val noise = (i * 7) % 11 - 5 // -5..5
      (g, i.toLong, i.toLong, 3L * i + noise, i % 5 match {
        case 0 => 1; case 4 => 2; case _ => 0
      })
    }

  test("qhat bounds the noise and test coverage meets 90% on " +
      "exchangeable data") {
    val df = rows("a", 200).toDF("g", "id", "x", "y", "role")
    val r = Conformal.splitConformal(df, "g", "id", "x", "y", "role")
      .collect().head
    val (nCal, kRank, qhat) = (r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(kRank === math.min((900000L * (nCal + 1) + 999999L) / 1000000L,
      nCal))
    // the residual scale is the noise scale (|noise| <= 5 plus the
    // fitted-line offset), so qhat must be small and positive
    assert(qhat > 0.0 && qhat < 7.0, s"qhat $qhat")
    val coverage = r.getLong(6)
    assert(coverage >= 850000L, s"coverage $coverage ppm")
  }

  test("groups without a fittable model are absent; deterministic " +
      "under repartitioning") {
    val degenerate = (1 to 20).map(i =>
      ("flat", 100L + i, 5L, 7L, i % 5 match {
        case 0 => 1; case 4 => 2; case _ => 0
      }))
    val df = (rows("a", 100) ++ degenerate)
      .toDF("g", "id", "x", "y", "role")
    val out = Conformal.splitConformal(df, "g", "id", "x", "y", "role")
      .collect()
    assert(out.map(_.getString(0)).toSet === Set("a")) // "flat" has varx=0
    val again = Conformal.splitConformal(
        df.repartition(7), "g", "id", "x", "y", "role")
      .collect()
    assert(out.toSeq === again.toSeq)
  }
}
