package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("collapses runs into intervals, latest open") {
    val log = Seq(
      (1L, ts(1), "bronze", 101L),
      (1L, ts(2), "bronze", 102L),
      (1L, ts(3), "gold", 103L),
      (1L, ts(4), "bronze", 104L),
      (2L, ts(5), "silver", 105L)
    ).toDF("user_id", "ts", "tier", "event_id")
    val out = Scd2.fromChangeLog(log, Seq("user_id"), Seq("tier"),
        "ts", Seq("event_id"))
      .orderBy("user_id", "valid_from").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "bronze"), (1L, "gold"), (1L, "bronze"), (2L, "silver")))
    // intervals chain: each valid_to equals the next valid_from
    assert(out(0).getTimestamp(3) === out(1).getTimestamp(2))
    assert(out(1).getTimestamp(3) === out(2).getTimestamp(2))
    assert(out(2).isNullAt(3) && out(2).getBoolean(4))   // user 1 current
    assert(out(3).isNullAt(3) && out(3).getBoolean(4))   // user 2 current
    assert(!out(0).getBoolean(4) && !out(1).getBoolean(4))
  }

  test("null attributes compare null-safely") {
    val log = Seq(
      (1L, ts(1), Option.empty[String], 1L),
      (1L, ts(2), Option.empty[String], 2L),   // same run as row 1
      (1L, ts(3), Option("x"), 3L)
    ).toDF("user_id", "ts", "tier", "event_id")
    val out = Scd2.fromChangeLog(log, Seq("user_id"), Seq("tier"),
        "ts", Seq("event_id"))
      .orderBy("valid_from").collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(1) && out(1).getString(1) === "x")
  }

  test("plans exactly one exchange") {
    val log = Seq((1L, ts(1), "a", 1L)).toDF("user_id", "ts", "tier", "event_id")
    val plan = Scd2.fromChangeLog(log, Seq("user_id"), Seq("tier"),
      "ts", Seq("event_id")).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "ReusedExchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange:\n$plan")
  }

  test("multi-attribute change detection tracks the tuple") {
    val log = Seq(
      (1L, ts(1), "a", 10, 1L),
      (1L, ts(2), "a", 20, 2L),   // second attr changes → new run
      (1L, ts(3), "a", 20, 3L)
    ).toDF("user_id", "ts", "x", "y", "event_id")
    val out = Scd2.fromChangeLog(log, Seq("user_id"), Seq("x", "y"),
      "ts", Seq("event_id")).collect()
    assert(out.length === 2)
  }
}
