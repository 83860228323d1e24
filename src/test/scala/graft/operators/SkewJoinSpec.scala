package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SkewJoin: equivalence with a plain join under heavy key skew,
  * right-side multiplicity, and exact hot-key detection.
  */
class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  // 90% of the left rows carry key 7; right has multiplicity 2 on the
  // hot key and 1 elsewhere, plus an unmatched key.
  private lazy val left = ((0 until 900).map(i => (7L, i.toLong)) ++
    (0 until 100).map(i => ((i % 10).toLong, 1000L + i)))
    .toDF("k", "payload")
  private lazy val right = (Seq((7L, "hot-a"), (7L, "hot-b")) ++
    (0L until 10L).map(k => (k, s"dim-$k")) ++ Seq((99L, "unmatched")))
    .toDF("rk", "label")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("payload"), col("label"))
      .as[(Long, Long, String)].collect().sorted.toSeq

  test("hotKeys: exact over-threshold detection") {
    assert(SkewJoin.hotKeys(left, "k", 500L) == Seq(7L))
    assert(SkewJoin.hotKeys(left, "k", 5000L).isEmpty)
    // threshold below the cold keys' counts surfaces them too
    assert(SkewJoin.hotKeys(left, "k", 5L).toSet.contains(7L))
  }

  test("saltedInnerJoin equals the plain join, with multiplicity") {
    val plain = canon(left.join(right, left("k") === right("rk")))
    // key 7 appears 900+10 times on the left, each matching 3 right
    // rows (hot-a, hot-b, dim-7); the other 90 cold rows match once
    assert(plain.size == 910 * 3 + 90)
    val salted = canon(SkewJoin.saltedInnerJoin(
      left, right, "k", "rk", salts = 8, hot = Seq(7L)))
    assert(salted == plain)
  }

  test("left_outer/semi/anti salted joins equal their plain twins") {
    import org.apache.spark.sql.DataFrame
    // left gains an unmatched hot key (77) and a null-key row
    val l2 = left.unionByName(
      (Seq((77L, 5000L)) ++ (0 until 20).map(i => (77L, 5001L + i)))
        .toDF("k", "payload"))
      .unionByName(Seq((Option.empty[Long], 9999L)).toDF("k", "payload"))
    def plain(t: String) = l2.join(right, l2("k") === right("rk"), t)
    def salted(t: String) = SkewJoin.saltedJoin(
      l2, right, "k", "rk", salts = 4, hot = Seq(7L, 77L), joinType = t)
    def canonCols(df: DataFrame, cols: Seq[String]) =
      df.select(cols.map(col): _*)
        .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

    for (t <- Seq("left_outer", "left_semi", "left_anti")) {
      val cols = if (t == "left_outer") Seq("k", "payload", "label")
        else Seq("k", "payload")
      assert(canonCols(salted(t), cols) == canonCols(plain(t), cols), t)
    }
  }

  test("auto-detected hot set and empty hot set both stay correct") {
    val plain = canon(left.join(right, left("k") === right("rk")))
    val auto = canon(SkewJoin.saltedInnerJoin(
      left, right, "k", "rk", salts = 4, hotThreshold = 500L))
    assert(auto == plain)
    val none = canon(SkewJoin.saltedInnerJoin(
      left, right, "k", "rk", salts = 4, hot = Seq.empty))
    assert(none == plain)
  }
}
