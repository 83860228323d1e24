package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

import scala.util.Random

/** Golden + equivalence tests for AsOfJoin and RangeJoin. */
class AsOfRangeJoinSpec extends SparkSuite {
  import spark.implicits._

  // left: (id, key, t); right: (key, t, pid, pv)
  private lazy val left = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 25L), (4L, "a", 30L),
    (5L, "b", 5L), (6L, "b", 50L),
    (7L, "c", 99L)
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    ("a", 20L, 100L, 1.5), ("a", 28L, 101L, 2.5),
    ("b", 49L, 102L, 3.5), ("b", 51L, 103L, 4.5),
    ("d", 1L, 104L, 9.9)
  ).toDF("k", "t", "pid", "pv")

  test("AsOfJoin.backward: latest right at-or-before, inclusive ties") {
    val out = AsOfJoin.backward(left, right, "k", "t", "t",
        Seq("pid", "pv"))
      .orderBy(col("id"))
      .select(col("id"), col("pid"), col("pv"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, null, null),      // before any right row for key a
      (2L, 100L, 1.5),       // exact tie t=20 matches (inclusive)
      (3L, 100L, 1.5),       // 25 → last right at 20
      (4L, 101L, 2.5),       // 30 → right at 28
      (5L, null, null),      // b@5 before b@49
      (6L, 102L, 3.5),       // b@50 → 49, not 51
      (7L, null, null)))     // key c has no right rows
  }

  test("AsOfJoin.forward: earliest right at-or-after") {
    val out = AsOfJoin.forward(left, right, "k", "t", "t",
        Seq("pid", "pv"))
      .orderBy(col("id"))
      .select(col("id"), col("pid"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1)))
    assert(out.toSeq == Seq(
      (1L, 100L), (2L, 100L), (3L, 101L), (4L, null),
      (5L, 102L), (6L, 103L), (7L, null)))
  }

  test("AsOfJoin: null right times dropped, null left time → null match") {
    val l = Seq((1L, "a", Option(10L)), (2L, "a", Option.empty[Long]))
      .toDF("id", "k", "t")
    val r = Seq(("a", Option(5L), 100L), ("a", Option(15L), 150L),
        ("a", Option.empty[Long], 200L))
      .toDF("k", "t", "pid")
    val back = AsOfJoin.backward(l, r, "k", "t", "t", Seq("pid"))
      .orderBy(col("id")).select(col("pid"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getLong(0))
    assert(back.toSeq == Seq(100L, null))
    val fwd = AsOfJoin.forward(l, r, "k", "t", "t", Seq("pid"))
      .orderBy(col("id")).select(col("pid"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getLong(0))
    assert(fwd.toSeq == Seq(150L, null))
  }

  test("AsOfJoin: one shuffle, no join operator in the plan") {
    val plan = AsOfJoin.backward(left, right, "k", "t", "t", Seq("pid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }

  test("AsOfJoin.backwardWithin: stale matches nulled by tolerance") {
    val out = AsOfJoin.backwardWithin(left, right, "k", "t", "t",
        Seq("pid"), maxGap = lit(4))
      .orderBy(col("id")).select(col("pid"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getLong(0))
    assert(out.toSeq == Seq(
      null,  // id 1: no match at all
      100L,  // id 2: tie match, gap 0
      null,  // id 3: match at 20, gap 5 > 4 → stale
      101L,  // id 4: match at 28, gap 2
      null,  // id 5: no match
      102L,  // id 6: match at 49, gap 1
      null)) // id 7: key without right rows
  }

  test("AsOfJoin.broadcastBackward: equals the shuffle path, fact side unshuffled") {
    val viaShuffle = AsOfJoin.backward(left, right, "k", "t", "t",
        Seq("pid", "pv"))
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    val df = AsOfJoin.broadcastBackward(left, right, "k", "t", "t",
      Seq("pid", "pv"))
    assert(df.orderBy(col("id")).collect().map(_.toSeq).toSeq == viaShuffle)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    // the only hash exchange is the dimension groupBy — the fact side
    // reaches the join shuffle-free
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"fact side must not shuffle:\n$plan")
  }

  test("AsOfJoin.broadcastBackward: null left time and missing key → null") {
    import spark.implicits._
    val l = Seq((1L, "a", Option(10L)), (2L, "a", Option.empty[Long]),
        (3L, "zzz", Option(10L)))
      .toDF("id", "k", "t")
    val out = AsOfJoin.broadcastBackward(l, right, "k", "t", "t", Seq("pid"))
      .orderBy(col("id")).select(col("pid"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getLong(0))
    assert(out.toSeq == Seq(null, null, null)) // a@10 precedes a@20
  }

  test("RangeJoin: broadcast and bucketed paths agree on random data") {
    val rnd = new Random(42)
    val points = (0 until 2000)
      .map(i => (i.toLong, rnd.nextDouble() * 1000 - 100))
      .toDF("pid", "x")
    // overlapping intervals of varied width, some degenerate/null
    val intervals = ((0 until 300).map { i =>
      val lo = rnd.nextDouble() * 900 - 100
      (i.toLong, Option(lo), Option(lo + rnd.nextDouble() * 60))
    } ++ Seq((300L, Option(5.0), Option(5.0)),          // empty [5,5)
      (301L, Option.empty[Double], Option(10.0))))      // null lo
      .toDF("iid", "lo", "hi")

    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("pid"), col("iid")).as[(Long, Long)]
        .collect().sorted.toSeq

    val viaBroadcast = canon(RangeJoin.broadcastPointInInterval(
      points, "x", intervals, "lo", "hi"))
    val viaBuckets = canon(RangeJoin.bucketedPointInInterval(
      points, "x", intervals, "lo", "hi", bucketWidth = 25.0))
    assert(viaBroadcast.nonEmpty)
    assert(viaBroadcast == viaBuckets)
  }

  test("RangeJoin: half-open bounds — lo matches, hi does not") {
    val pts = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "x")
    val iv = Seq((7L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val b = RangeJoin.broadcastPointInInterval(pts, "x", iv, "lo", "hi")
      .select("pid").as[Long].collect().toSeq
    assert(b == Seq(1L))
    val k = RangeJoin.bucketedPointInInterval(pts, "x", iv, "lo", "hi", 4.0)
      .select("pid").as[Long].collect().toSeq
    assert(k == Seq(1L))
  }

  test("reserved __ column names are rejected eagerly, by name") {
    val poisonedLeft = left.withColumn("__salt", lit(1))
    val poisonedRight = right.withColumn("__k", lit(1))
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(poisonedLeft, right, "k", "t", "t", Seq("pid"))
    }
    assert(e1.getMessage.contains("__salt"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.broadcastBackward(left, poisonedRight, "k", "t", "t",
        Seq("pid"))
    }
    assert(e2.getMessage.contains("__k"))
    val e3 = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(poisonedLeft, right, "k", "k", 4, Seq("a"))
    }
    assert(e3.getMessage.contains("__salt"))
    val e4 = intercept[IllegalArgumentException] {
      RangeJoin.bucketedPointInInterval(
        left.withColumn("__b", lit(1)), "t", right, "t", "pid", 4.0)
    }
    assert(e4.getMessage.contains("__b"))
  }
}
