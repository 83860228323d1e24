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

  test("invariants on a seeded random log: intervals chain, cover, " +
      "and classify every event") {
    val rnd = new scala.util.Random(42)
    val log = (1L to 400L).map { i =>
      (rnd.nextInt(10).toLong, ts((i % 50).toInt), // many ts collisions
        s"v${rnd.nextInt(3)}", i)                  // tie = unique event id
    }.toDF("user_id", "ts", "tier", "event_id")
    val hist = Scd2.fromChangeLog(log, Seq("user_id"), Seq("tier"),
        "ts", Seq("event_id"))
      .orderBy("user_id", "valid_from").collect()
      .groupBy(_.getLong(0))

    val events = log.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))

    for ((key, runs) <- hist) {
      // chained: valid_to(i) == valid_from(i+1); only the last open
      runs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(3) === b.getTimestamp(2))
        case _ =>
      }
      assert(runs.init.forall(!_.getBoolean(4)) && runs.last.getBoolean(4))
      assert(runs.last.isNullAt(3))
      // coverage: first valid_from is the key's earliest change
      val keyEvents = events.filter(_._1 == key)
      assert(runs.head.getTimestamp(2).getTime ===
        keyEvents.map(_._2.getTime).min)
      // classification: the run containing each event (by the same
      // (ts, event_id) order) carries the event's attribute... the
      // run's attr is the attr of the FIRST event in the run, and
      // every event between two boundaries shares it by construction
      // of the change flag — verify via total run count:
      val ordered = keyEvents.sortBy(e => (e._2.getTime, e._4))
      val changes = 1 + ordered.sliding(2).count {
        case Array(a, b) => a._3 != b._3
        case _ => false
      }
      assert(runs.length === changes,
        s"key $key: ${runs.length} runs vs $changes change points")
    }
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
