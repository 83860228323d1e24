package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** The custom sessionize operator: exact session-id assignment at µs
  * precision, and the physical-plan properties that justify its
  * existence (single exchange; downstream per-user aggregation reuses
  * the partitioning).
  */
class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private val gap = 1800L // seconds

  test("assigns strictly-gap-delimited 1-based session ids") {
    val base = 1700000000000000L
    val rows = Seq(
      (1L, base),
      (1L, base + 1800000000L),               // gap exactly 1800 s → same session
      (1L, base + 1800000000L + 1800000500L), // 1800.0005 s → new session
      (2L, base),
      (2L, base + 3600L * 1000000L))          // 1 h → new session
    val df = rows.toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val got = Sessionize(df, "user_id", "ts", gap)
      .select($"user_id", unix_micros($"ts").as("us"), $"session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(got.map(_._3).toSeq == Seq(1L, 1L, 2L, 1L, 2L))
  }

  test("null timestamps open sessions exactly like the lag-window twin") {
    val base = 1700000000000000L
    val rows: Seq[(Long, Option[Long])] = Seq(
      (1L, None), (1L, None), (1L, Some(base)),
      (1L, Some(base + 10L)),
      (2L, Some(base)), (2L, None))
    val df = rows.toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val op = Sessionize(df, "user_id", "ts", gap)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), max($"session_id").as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts") // asc = NULLS FIRST, like the operator
    val lagged = df
      .withColumn("pt", lag($"ts", 1).over(w))
      .withColumn("ns",
        when($"pt".isNull ||
          (unix_micros($"ts") - unix_micros($"pt")) > gap * 1000000L, 1L)
          .otherwise(0L))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"ns").as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(op.toSeq == lagged.toSeq)
    // user 1: null, null, real, real(+10µs) → sessions open at row 1,
    // row 2 (prev ts null), row 3 (prev ts null); row 4 continues → 3
    assert(op.find(_._1 == 1L).get._3 == 3L)
  }

  test("plan: SessionizeExec present; one shuffle feeds sessionize AND groupBy") {
    val df = (0L until 1000L).map(i => (i % 7, 1700000000000000L + i * 1000000L))
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val agg = Sessionize(df, "user_id", "ts", gap)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), max($"session_id").as("n_sessions"))
    agg.collect() // force AQE to finalize the plan

    def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: collectNodes(q.plan)
      case other =>
        (other +: other.children.flatMap(collectNodes)) ++
          other.subqueries.flatMap(collectNodes)
    }
    val nodes = collectNodes(agg.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[SessionizeExec]), "SessionizeExec missing")
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles == 1, s"expected exactly 1 shuffle, got $shuffles")
  }

  test("plan: SessionizeExec fuses into a WholeStageCodegen span") {
    val df = (0L until 1000L).map(i => (i % 7, 1700000000000000L + i * 1000000L))
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val agg = Sessionize(df, "user_id", "ts", gap)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), max($"session_id").as("n_sessions"))
    agg.collect()

    def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: collectNodes(q.plan)
      case other => other +: other.children.flatMap(collectNodes)
    }
    val nodes = collectNodes(agg.queryExecution.executedPlan)
    val wscg = nodes.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.exists(w =>
      w.collect { case s: SessionizeExec => s }.nonEmpty),
      s"SessionizeExec outside codegen:\n${agg.queryExecution.executedPlan}")
  }

  test("string user keys survive buffer reuse across the sorted stream") {
    // string keys exercise the generated clone-on-retain path: the sort
    // iterator recycles its record buffer, so an unclosed UTF8String
    // would compare corrupted bytes once the group spans a page
    val rows = (0 until 3000).map { i =>
      val u = s"user_${(i * 2654435761L) % 11}"
      (u, 1700000000000000L + ((i * 40503L) % 9973) * 700000000L)
    }
    val df = rows.toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val op = Sessionize(df, "user_id", "ts", gap)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), max($"session_id").as("n_sessions"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
    val lagged = df
      .withColumn("pt", lag($"ts", 1).over(w))
      .withColumn("ns",
        when($"pt".isNull ||
          (unix_micros($"ts") - unix_micros($"pt")) > gap * 1000000L, 1L)
          .otherwise(0L))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"ns").as("n_sessions"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(op.toSeq == lagged.toSeq)
  }

  test("matches the lag-window formulation on random-ish data") {
    val rows = (0 until 2000).map { i =>
      val u = (i * 2654435761L) % 13
      val t = 1700000000000000L +
        ((i * 40503L) % 9973) * 700000000L // pseudo-random µs offsets
      (u, t)
    }
    val df = rows.toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val op = Sessionize(df, "user_id", "ts", gap)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), max($"session_id").as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
    val lagged = df
      .withColumn("pt", lag($"ts", 1).over(w))
      .withColumn("ns",
        when($"pt".isNull ||
          (unix_micros($"ts") - unix_micros($"pt")) > gap * 1000000L, 1L)
          .otherwise(0L))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"ns").as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(op.toSeq == lagged.toSeq)
  }

  test("binary user keys sessionize identically with codegen ON and " +
      "OFF — the interpreted path compares bytes, not references") {
    // Scala != on Array[Byte] is reference inequality: before the
    // fix the interpreted fallback opened a new group on EVERY row
    // (session_id 1 forever) while codegen compared content.
    val rows = (0 until 60).map { i =>
      (s"u${i % 3}".getBytes("UTF-8"),
        1700000000000000L + (i / 3).toLong * 1800L * 1000000L *
          (if ((i / 3) % 4 == 0) 3L else 1L))
    }
    def run(codegen: Boolean) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try {
        val df = rows.toDF("user_id", "us")
          .select($"user_id", timestamp_micros($"us").as("ts"))
        Sessionize(df, "user_id", "ts", 3600L)
          .groupBy($"user_id")
          .agg(max($"session_id").as("n_sessions"))
          .collect()
          .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")
            -> r.getLong(1))
          .sortBy(_._1).toSeq
      } finally
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val on = run(codegen = true)
    val off = run(codegen = false)
    assert(on == off, s"codegen $on vs interpreted $off")
    // and sessions actually split (> 1) — a reference-equality bug
    // would ALSO pass an equality check by making both paths wrong
    // if run(true) fell back, so assert the real session structure
    assert(on.forall(_._2 > 1), s"$on")
  }

  test("degenerate gaps are rejected loudly") {
    val df = Seq((1L, 1L)).toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    intercept[IllegalArgumentException] {
      Sessionize(df, "user_id", "ts", 0L)
    }
    intercept[IllegalArgumentException] {
      Sessionize(df, "user_id", "ts", Long.MaxValue)
    }
    intercept[IllegalArgumentException] {
      Sessionize(df.select($"user_id".cast("double").as("user_id"),
        $"ts"), "user_id", "ts", 3600L)
    }
  }
}
