package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import graft.operators.{AsOfJoin, RangeJoin}
import graft.streaming.StreamingOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Events-table queries: batch window aggregation, sessionization,
  * JSON extraction — each with a Structured-Streaming twin where the
  * semantics allow a deterministic batch oracle — plus the multimodal
  * binary-column queries.
  */
object EventQueries {

  /** Batch oracle shared by q_transitions and its streaming twin. */
  private val transitionsOracle = """
    WITH seq AS (
      SELECT event_type AS from_state,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)
               AS to_state
      FROM events),
    pairs AS (
      SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_state IS NOT NULL
      GROUP BY 1, 2),
    tot AS (
      SELECT from_state, CAST(SUM(n) AS BIGINT) AS t
      FROM pairs GROUP BY 1)
    SELECT p.from_state, p.to_state, p.n,
           CAST((p.n * 1000000) // t.t AS BIGINT) AS p_ppm
    FROM pairs p JOIN tot t USING (from_state)
    ORDER BY p.from_state, p.to_state
  """

  /** Batch oracle shared by the batch and streaming window queries. */
  private val windowOracle = """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
  """

  /** Batch oracle shared by the batch and streaming sessionizers:
    * sessions break on inactivity gaps > 1800 s. Gaps compare in epoch
    * MICROseconds after casting to µs TIMESTAMP, so a DuckDB that reads
    * the parquet's TIMESTAMP(NANOS) natively floors exactly like Spark
    * (which reads nanos-as-long and divides by 1000). The SUM is cast
    * to BIGINT: DuckDB types an integer SUM as HUGEINT (int128), which
    * the driver's hash serializes differently from Spark's BIGINT.
    */
  private val sessionsOracle = """
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             lag(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(CAST(ts AS TIMESTAMP))) AS pus
      FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN pus IS NULL OR us - pus > 1800000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM e
    GROUP BY user_id
    ORDER BY user_id
  """

  val all: Seq[QueryDef] = Seq(

    // Tumbling-window aggregation (batch): hour buckets as epoch
    // seconds, exact decimal sums cast to double at the edge.
    QueryDef(
      "q_events_window",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).as("sum_value"))
          .select(unix_timestamp(col("window.start")).as("hour_start"),
            col("event_type"), col("n"),
            col("sum_value").cast("double").as("sum_value"))
          .orderBy(col("hour_start"), col("event_type")),
      Some(windowOracle)),

    // The SAME aggregation as a watermarked streaming query (memory
    // sink, complete mode) — must match the batch oracle exactly.
    QueryDef(
      "q_stream_events",
      (s, dir) =>
        StreamingOps.eventWindowCounts(s, s"$dir/events.parquet")
          .orderBy(col("hour_start"), col("event_type")),
      Some(windowOracle)),

    // Streaming top-3 event types per hourly window: the watermarked
    // window aggregation plus a stateless cells-sized rank projection
    // (StreamingOps.windowTypeTopK scaladoc) — the oracle is the
    // batch rank over the same counts.
    QueryDef(
      "q_stream_topk",
      (s, dir) =>
        StreamingOps.windowTypeTopK(s, s"$dir/events.parquet", k = 3)
          .orderBy(col("hour_start"), col("rank")),
      Some("""
        WITH c AS (
          SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                   AS hour_start,
                 event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT hour_start, event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY hour_start
                                    ORDER BY n DESC, event_type)
                   AS rank
          FROM c)
        SELECT hour_start, rank, event_type, n
        FROM r WHERE rank <= 3
        ORDER BY hour_start, rank
      """)),

    // Period-over-period deltas: hourly event counts per type with
    // the previous hour's count, absolute delta, and integer-ppm
    // ratio — the dashboard staple. Pure integers (counts are
    // positive, so `div`/`//` agree); ONE type-keyed lag window over
    // the hours-sized aggregate, never the event stream.
    QueryDef(
      "q_period_delta",
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"),
            unix_timestamp(date_trunc("hour", col("ts")))
              .as("hour_start"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("hour_start"))
        hourly
          .withColumn("prev_n", lag(col("n"), 1).over(w))
          .filter(col("prev_n").isNotNull)
          .select(col("event_type"), col("hour_start"), col("n"),
            col("prev_n"), (col("n") - col("prev_n")).as("delta"),
            expr("(n * CAST(1000000 AS BIGINT)) div prev_n")
              .as("ratio_ppm"))
          .orderBy(col("event_type"), col("hour_start"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type,
                 CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                   AS hour_start,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        lagged AS (
          SELECT event_type, hour_start, n,
                 lag(n, 1) OVER (PARTITION BY event_type
                                 ORDER BY hour_start) AS prev_n
          FROM hourly)
        SELECT event_type, hour_start, n, prev_n,
               n - prev_n AS delta,
               CAST((n * 1000000) // prev_n AS BIGINT) AS ratio_ppm
        FROM lagged WHERE prev_n IS NOT NULL
        ORDER BY event_type, hour_start
      """)),

    // First-order Markov transition matrix over per-user event
    // sequences: counts and integer-ppm row-normalized probabilities
    // of event_type → next event_type — the user-flow model behind
    // funnel/journey analytics. ONE user-keyed window pass for the
    // lead, then state-pair-sized aggregations (|types|² rows).
    QueryDef(
      "q_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = Tables.events(s, dir)
          .withColumn("to_state", lead(col("event_type"), 1).over(w))
          .filter(col("to_state").isNotNull)
          .groupBy(col("event_type").as("from_state"), col("to_state"))
          .agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy(col("from_state"))
          .agg(sum(col("n")).as("__t"))
        pairs.join(broadcast(totals), "from_state")
          .select(col("from_state"), col("to_state"), col("n"),
            expr("(n * CAST(1000000 AS BIGINT)) div __t").as("p_ppm"))
          .orderBy(col("from_state"), col("to_state"))
      },
      Some(transitionsOracle)),

    // Streaming twin of q_transitions: one last-event row of state
    // per user emits (prev -> current) pairs across micro-batches
    // (StreamingOps.transitionPairs); the matrix aggregation runs
    // over the emitted pair stream, so the batch oracle checks the
    // stream by construction.
    QueryDef(
      "q_stream_transitions",
      (s, dir) =>
        StreamingOps.transitionMatrixStream(s, s"$dir/events.parquet")
          .orderBy(col("from_state"), col("to_state")),
      Some(transitionsOracle)),

    // Additive hour-of-day seasonality per event type: which hours
    // run hot, as exact integer micro-cent means and deltas vs the
    // type's own overall mean (TimeSeries.seasonalProfile scaladoc).
    QueryDef(
      "q_seasonality",
      (s, dir) =>
        graft.operators.TimeSeries.seasonalProfile(
          Tables.events(s, dir)
            .select(col("event_type"), col("ts"),
              (col("value").cast(DecimalType(18, 2)) * 100)
                .cast("long").as("cents")),
          "event_type", "ts", "cents")
          .orderBy(col("event_type"), col("hour_of_day")),
      Some("""
        WITH c AS (
          SELECT event_type,
                 CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                               AS BIGINT)) AS BIGINT) AS s
          FROM events GROUP BY 1, 2),
        o AS (
          SELECT event_type, CAST(SUM(n) AS BIGINT) AS tn,
                 CAST(SUM(s) AS BIGINT) AS ts
          FROM c GROUP BY 1)
        SELECT c.event_type, c.hour_of_day, c.n,
               CAST((c.s * 1000000) // c.n AS BIGINT) AS mean_micro,
               CAST((c.s * 1000000) // c.n
                    - (o.ts * 1000000) // o.tn AS BIGINT)
                 AS seasonal_micro
        FROM c JOIN o ON o.event_type = c.event_type
        ORDER BY c.event_type, c.hour_of_day
      """)),

    // Sessionization (batch): lag-window gap detection.
    QueryDef(
      "q_sessions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        Tables.events(s, dir)
          .withColumn("pt", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("pt").isNull ||
              (unix_micros(col("ts")) - unix_micros(col("pt"))) >
                1800L * 1000000L, 1L).otherwise(0L))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("new_session")).as("n_sessions"))
          .orderBy(col("user_id"))
      },
      Some(sessionsOracle)),

    // Funnel analysis: per-user FIRST occurrence of each stage, depth
    // = longest strictly-increasing prefix of
    // signup -> view -> click -> purchase. One aggregation (min-when
    // per stage) + one tiny group-by — never a per-user sort or a
    // self-join per stage.
    QueryDef(
      "q_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        def firstOf(t: String) =
          min(when(col("event_type") === t, col("us"))).as(s"t_$t")
        val stage = when(col("t_signup").isNull, 0)
          .when(col("t_view").isNull || col("t_view") <= col("t_signup"), 1)
          .when(col("t_click").isNull || col("t_click") <= col("t_view"), 2)
          .when(col("t_purchase").isNull ||
            col("t_purchase") <= col("t_click"), 3)
          .otherwise(4)
        e.groupBy(col("user_id"))
          .agg(firstOf("signup"), firstOf("view"),
            firstOf("click"), firstOf("purchase"))
          .select(stage.as("stage"))
          .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("stage"))
      },
      Some("""
        WITH f AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'signup'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t1,
                 min(CASE WHEN event_type = 'view'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t2,
                 min(CASE WHEN event_type = 'click'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t3,
                 min(CASE WHEN event_type = 'purchase'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t4
          FROM events GROUP BY 1),
        s AS (
          SELECT CASE WHEN t1 IS NULL THEN 0
                      WHEN t2 IS NULL OR t2 <= t1 THEN 1
                      WHEN t3 IS NULL OR t3 <= t2 THEN 2
                      WHEN t4 IS NULL OR t4 <= t3 THEN 3
                      ELSE 4 END AS stage
          FROM f)
        SELECT stage, COUNT(*) AS n_users FROM s
        GROUP BY stage ORDER BY stage
      """)),

    // Cohort retention: users grouped by first-active ISO week,
    // distinct-active counts at each whole-week offset. Two
    // aggregations + one join on user_id; the cohort table is
    // user-sized, not event-sized.
    QueryDef(
      "q_cohort_retention",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("wk"))
          .distinct()
        val cohorts = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
        e.join(cohorts, "user_id")
          .select(col("user_id"), col("cohort"),
            (datediff(col("wk"), col("cohort")) / 7).cast("int")
              .as("week_offset"))
          .groupBy(col("cohort"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy(col("cohort"), col("week_offset"))
      },
      Some("""
        WITH e AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS wk
          FROM events),
        cohorts AS (
          SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1)
        SELECT c.cohort,
               CAST(datediff('day', c.cohort, e.wk) / 7 AS INT)
                 AS week_offset,
               COUNT(DISTINCT e.user_id) AS n_active
        FROM e JOIN cohorts c ON c.user_id = e.user_id
        GROUP BY 1, 2
        ORDER BY 1, 2
      """)),

    // Streaming curation gate: stateless batch curation expressions
    // run unchanged under the streaming engine (StreamingOps
    // .curatedDocRejects scaladoc); the oracle is the batch replay.
    QueryDef(
      "q_stream_curate",
      (s, dir) =>
        graft.streaming.StreamingOps
          .curatedDocRejects(s, s"$dir/documents.parquet")
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id, failed_rule FROM (
          SELECT doc_id,
                 CASE WHEN len(string_split(text, ' ')) < 30
                        THEN 'too_few_tokens'
                      WHEN CAST(len(list_distinct(string_split(text, ' ')))
                             AS DOUBLE)
                           / CAST(len(string_split(text, ' ')) AS DOUBLE)
                           < 0.3
                        THEN 'low_diversity'
                      WHEN length(text) < 200 THEN 'too_short'
                      ELSE NULL END AS failed_rule
          FROM documents)
        WHERE failed_rule IS NOT NULL
        ORDER BY doc_id
      """)),

    QueryDef(
      "q_stream_dedup",
      (s, dir) =>
        StreamingOps.dedupedEventKeys(s, s"$dir/events.parquet")
          .orderBy(col("user_id"), col("event_type")),
      Some("""
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type
      """)),

    // Watermarked stream-stream interval join: each purchase joined to
    // the same user's clicks in the preceding hour. Inner matches emit
    // eagerly, so the bounded one-batch run produces the complete
    // interval join; the oracle replays it relationally in epoch µs
    // (the engine's event-time precision).
    QueryDef(
      "q_stream_join",
      (s, dir) =>
        StreamingOps.attributedConversions(s, s"$dir/events.parquet")
          .orderBy(col("conv_id"), col("click_id")),
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events)
        SELECT l.event_id AS conv_id, r.event_id AS click_id
        FROM e l JOIN e r
          ON l.user_id = r.user_id
         AND l.event_type = 'purchase' AND r.event_type = 'click'
         AND r.us <= l.us AND r.us >= l.us - 3600000000
        ORDER BY conv_id, click_id
      """)),

    // LEFT-OUTER twin of q_stream_join: conversions with NO
    // attributable click emit (conv_id, NULL) once the final global
    // watermark (min of both sides' max event time − 2 h) proves no
    // match can arrive; unmatched conversions above it stay buffered,
    // exactly as a live stream would withhold them. The oracle
    // replays both the interval join AND that emission rule.
    QueryDef(
      "q_stream_left_join",
      (s, dir) =>
        StreamingOps.attributedConversionsLeftOuter(s, s"$dir/events.parquet")
          .orderBy(col("conv_id"), col("click_id")),
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        conv AS (SELECT event_id AS conv_id, user_id, us
                 FROM e WHERE event_type = 'purchase'),
        clk AS (SELECT event_id AS click_id, user_id, us
                FROM e WHERE event_type = 'click'),
        wm AS (SELECT least((SELECT max(us) FROM conv),
                            (SELECT max(us) FROM clk))
                      - 7200000000 AS w),
        m AS (
          SELECT c.conv_id, k.click_id
          FROM conv c JOIN clk k
            ON c.user_id = k.user_id
           AND k.us <= c.us AND k.us >= c.us - 3600000000)
        SELECT conv_id, click_id FROM m
        UNION ALL
        SELECT c.conv_id, NULL AS click_id
        FROM conv c
        WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.conv_id = c.conv_id)
          AND c.us < (SELECT w FROM wm)
        ORDER BY conv_id, click_id NULLS FIRST
      """)),

    // Stream-static broadcast enrichment: the stateless lookup join
    // at ingest (events stream × customer dim). The oracle is the
    // plain batch join — stream-static joins are batch-equivalent by
    // construction, which is exactly the property worth pinning.
    QueryDef(
      "q_stream_enrich",
      (s, dir) =>
        StreamingOps.enrichedEventStream(s, s"$dir/events.parquet",
            Tables.customer(s, dir)
              .select(col("c_custkey"), col("c_mktsegment")),
            "user_id", "c_custkey", Seq("c_mktsegment"))
          .orderBy(col("event_id")),
      Some("""
        SELECT e.event_id, e.user_id AS key, c.c_mktsegment
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        ORDER BY e.event_id
      """)),

    // Rolling DISTINCT count over a row window — the aggregate Spark's
    // window functions lack natively (no count(DISTINCT) OVER):
    // expressed as size(array_distinct(collect_list OVER)), which
    // stays a single per-user window pass with a 10-row frame. Per
    // event: how many distinct event types the user produced in their
    // last 10 events — a session-richness signal.
    QueryDef(
      "q_rolling_distinct",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(-9, Window.currentRow)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("k10",
            size(array_distinct(collect_list(col("event_type")).over(w)))
              .cast("long"))
          .select(col("event_id"), col("user_id"), col("us"), col("k10"))
          .orderBy(col("user_id"), col("us"), col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events)
        SELECT event_id, user_id, us,
               CAST(len(list_distinct(
                 list(event_type) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)))
                 AS BIGINT) AS k10
        FROM e
        ORDER BY user_id, us, event_id
      """)),

    // The SAME sessionization as stateful streaming
    // (mapGroupsWithState) — matches the lag-window batch oracle.
    QueryDef(
      "q_stream_sessions",
      (s, dir) =>
        StreamingOps.sessionCounts(s, s"$dir/events.parquet")
          .orderBy(col("user_id")),
      Some(sessionsOracle)),

    // Closed-session SPANS via flatMapGroupsWithState (the 0..n-rows
    // state API; the fifth sessionizer face): every session except
    // each user's final still-open one, with start/end/count. The
    // oracle replays the lag-window sessionization and drops each
    // user's last session.
    QueryDef(
      "q_stream_session_spans",
      (s, dir) =>
        StreamingOps.closedSessionSpans(s, s"$dir/events.parquet")
          .orderBy(col("user_id"), col("start_us")),
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 lag(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_us(CAST(ts AS TIMESTAMP))) AS pus
          FROM events),
        s AS (
          SELECT user_id, us,
                 SUM(CASE WHEN pus IS NULL OR us - pus > 1800000000
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us
                         ROWS UNBOUNDED PRECEDING) AS sid
          FROM e),
        spans AS (
          SELECT user_id, sid, MIN(us) AS start_us, MAX(us) AS end_us,
                 COUNT(*) AS n_events
          FROM s GROUP BY 1, 2),
        last AS (SELECT user_id, MAX(sid) AS maxsid FROM spans GROUP BY 1)
        SELECT sp.user_id, sp.start_us, sp.end_us, sp.n_events
        FROM spans sp JOIN last l
          ON l.user_id = sp.user_id AND sp.sid < l.maxsid
        ORDER BY sp.user_id, sp.start_us
      """)),

    // The SAME sessionization a third way: the custom whole-operator
    // plan (SessionizeLogical → SessionizeStrategy → SessionizeExec).
    // One exchange+sort feeds a single-pass session assignment, and
    // the downstream groupBy(user_id) reuses the partitioning with no
    // second shuffle — checked against the same batch oracle.
    QueryDef(
      "q_sessionize_op",
      (s, dir) =>
        graft.plans.Sessionize(
            Tables.events(s, dir).select(col("user_id"), col("ts")),
            "user_id", "ts", gapSeconds = 1800L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            max(col("session_id")).as("n_sessions"))
          .orderBy(col("user_id")),
      Some(sessionsOracle)),

    // The SAME sessionization a fourth way: Spark's native
    // session_window (merging gap windows inside one aggregation).
    // Edge semantics differ from the lag-window on an EXACT gap ==
    // 1800 s (half-open window vs strict >); the testdata has no
    // µs-exact 1800 s gap at any SF (checked), so all four paths face
    // one oracle.
    QueryDef(
      "q_session_window",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(sum(col("n")).as("n_events"),
            count(lit(1)).as("n_sessions"))
          .orderBy(col("user_id")),
      Some(sessionsOracle)),

    // JSON extraction from the props column: per-event-type stats of
    // $.k (bigint), exercising get_json_object pushdown-free scans.
    QueryDef(
      "q_json_extract",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
            max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type, COUNT(*) AS n,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """)),

    // ---- Multimodal binary columns ----

    // Payload metadata via the partition-batched stub decoder; the
    // oracle reproduces the deterministic fake (dims from nbytes,
    // md5 checksum) in SQL.
    QueryDef(
      "q_multimodal_meta",
      (s, dir) =>
        Multimodal.decodeMeta(
            Multimodal.withPayload(
              Tables.documents(s, dir), "doc_id", "text"))
          .orderBy(col("id")),
      Some("""
        SELECT doc_id AS id,
               octet_length(CAST(text AS BLOB)) AS nbytes,
               'txt' AS format,
               CAST(320 + (octet_length(CAST(text AS BLOB)) % 13) * 32 AS INT) AS width,
               CAST(240 + (octet_length(CAST(text AS BLOB)) % 7) * 40 AS INT) AS height,
               md5(text) AS checksum
        FROM documents
        ORDER BY id
      """)),

    // Byte-range frame sampling + fingerprint (video-pipeline shape).
    QueryDef(
      "q_multimodal_frames",
      (s, dir) =>
        Multimodal.sampleFrames(
            Multimodal.withPayload(
              Tables.documents(s, dir), "doc_id", "text"),
            frameBytes = 128, maxFrames = 3)
          .orderBy(col("id"), col("frame_idx")),
      Some("""
        SELECT doc_id AS id, f.i AS frame_idx,
               md5(substr(text, f.i * 128 + 1, 128)) AS frame_md5
        FROM documents, (VALUES (0), (1), (2)) AS f(i)
        WHERE f.i * 128 < length(text)
        ORDER BY id, frame_idx
      """)),

    // ---- Temporal / range joins ----

    // Backward as-of join: each event picks up the same user's most
    // recent purchase at-or-before its timestamp. Implemented as one
    // key-shuffle + ordered window pass (AsOfJoin.backward) — never a
    // non-equi join. The oracle is DuckDB's native ASOF LEFT JOIN,
    // compared at µs precision on both sides (Spark's event ts is
    // already µs-floored by Tables.events).
    QueryDef(
      "q_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("purchase_id"),
            col("value").as("purchase_value"))
        AsOfJoin.backward(
            ev.select(col("event_id"), col("user_id"), col("ts")),
            purchases, key = "user_id", leftTime = "ts",
            rightTime = "ts",
            payload = Seq("purchase_id", "purchase_value"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            col("purchase_id"), col("purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT e.event_id, e.user_id,
               epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
               p.event_id AS purchase_id, p.value AS purchase_value
        FROM events e
        ASOF LEFT JOIN (SELECT user_id,
                               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                               event_id, value
                        FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id
         AND p.us <= epoch_us(CAST(e.ts AS TIMESTAMP))
        ORDER BY e.event_id
      """)),

    // The SAME as-of join through the broadcast variant (per-key
    // timeline arrays, zero fact-side shuffle) — must match the same
    // ASOF oracle as the shuffle path.
    QueryDef(
      "q_asof_broadcast",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("purchase_id"),
            col("value").as("purchase_value"))
        AsOfJoin.broadcastBackward(
            ev.select(col("event_id"), col("user_id"), col("ts")),
            purchases, key = "user_id", leftTime = "ts",
            rightTime = "ts",
            payload = Seq("purchase_id", "purchase_value"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            col("purchase_id"), col("purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT e.event_id, e.user_id,
               epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
               p.event_id AS purchase_id, p.value AS purchase_value
        FROM events e
        ASOF LEFT JOIN (SELECT user_id,
                               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                               event_id, value
                        FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id
         AND p.us <= epoch_us(CAST(e.ts AS TIMESTAMP))
        ORDER BY e.event_id
      """)),

    // Forward direction: each event attributed to the same user's NEXT
    // purchase at-or-after it (DuckDB's ASOF infers direction from the
    // >= inequality).
    QueryDef(
      "q_asof_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("next_purchase_id"))
        AsOfJoin.forward(
            ev.select(col("event_id"), col("user_id"), col("ts")),
            purchases, key = "user_id", leftTime = "ts",
            rightTime = "ts", payload = Seq("next_purchase_id"))
          .select(col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("next_purchase_id"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT e.event_id,
               epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
               p.event_id AS next_purchase_id
        FROM events e
        ASOF LEFT JOIN (SELECT user_id,
                               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                               event_id
                        FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id
         AND p.us >= epoch_us(CAST(e.ts AS TIMESTAMP))
        ORDER BY e.event_id
      """)),

    // As-of with a staleness bound: purchases older than 30 minutes
    // don't count (merge_asof tolerance). The oracle post-filters
    // DuckDB's ASOF match with the same bound.
    QueryDef(
      "q_asof_tolerance",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("purchase_id"))
        AsOfJoin.backwardWithin(
            ev.select(col("event_id"), col("user_id"), col("ts")),
            purchases, key = "user_id", leftTime = "ts",
            rightTime = "ts", payload = Seq("purchase_id"),
            maxGap = expr("INTERVAL 30 MINUTES"))
          .select(col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("purchase_id"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT e.event_id,
               epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
               CASE WHEN p.us >= epoch_us(CAST(e.ts AS TIMESTAMP))
                             - 1800000000
                    THEN p.event_id END AS purchase_id
        FROM events e
        ASOF LEFT JOIN (SELECT user_id,
                               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                               event_id
                        FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id
         AND p.us <= epoch_us(CAST(e.ts AS TIMESTAMP))
        ORDER BY e.event_id
      """)),

    // Range (point-in-interval) join: band each event's value into
    // fixed price bands and aggregate per band. The band table is a
    // dimension → broadcast nested-loop is the RIGHT plan (zero
    // shuffles of the fact side); RangeJoinSpec proves the bucketed
    // equi-join variant equivalent for the large-interval-side case.
    QueryDef(
      "q_range_join",
      (s, dir) => {
        val bands = s.createDataFrame(
            (0L until 10L).map(i => (i, i * 50.0, (i + 1) * 50.0)))
          .toDF("band_id", "lo", "hi")
        RangeJoin.broadcastPointInInterval(
            Tables.events(s, dir).select(col("value")), "value",
            bands, "lo", "hi")
          .groupBy(col("band_id"), col("lo"), col("hi"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double")
              .as("sum_value"))
          .orderBy(col("band_id"))
      },
      Some("""
        SELECT CAST(b.band_id AS BIGINT) AS band_id, b.lo, b.hi,
               COUNT(*) AS n,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_value
        FROM events e
        JOIN (SELECT i AS band_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
              FROM range(0, 10) t(i)) b
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY 1, 2, 3
        ORDER BY 1
      """)),

    // The SAME banding through the bucketed equi-join path (the
    // large-interval-side strategy): must match the identical
    // inequality-join oracle as the broadcast path.
    QueryDef(
      "q_range_bucketed",
      (s, dir) => {
        val bands = s.createDataFrame(
            (0L until 10L).map(i => (i, i * 50.0, (i + 1) * 50.0)))
          .toDF("band_id", "lo", "hi")
        RangeJoin.bucketedPointInInterval(
            Tables.events(s, dir).select(col("value")), "value",
            bands, "lo", "hi", bucketWidth = 25.0)
          .groupBy(col("band_id"), col("lo"), col("hi"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double")
              .as("sum_value"))
          .orderBy(col("band_id"))
      },
      Some("""
        SELECT CAST(b.band_id AS BIGINT) AS band_id, b.lo, b.hi,
               COUNT(*) AS n,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_value
        FROM events e
        JOIN (SELECT i AS band_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
              FROM range(0, 10) t(i)) b
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY 1, 2, 3
        ORDER BY 1
      """)),

    // ---- Reshaping / sketches ----

    // Pivot (long → wide): per-user event counts, one column per
    // event type. The value list is explicit — at scale the implicit
    // form costs an extra distinct-collect job over the fact table to
    // discover the columns; never leave it implicit in a pipeline.
    QueryDef(
      "q_pivot_events",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("user_id")),
      Some("""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
               COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
               COUNT(*) FILTER (WHERE event_type = 'view')     AS view
        FROM events
        GROUP BY user_id
        ORDER BY user_id
      """)),

    // Distinct users per event type, twice: exact (count-distinct's
    // two-shuffle expand) and via a DataSketches HLL sketch — the
    // 100 TB path, because sketches partial-aggregate map-side and
    // merge associatively across partitions/days, which exact distinct
    // cannot. The hashed column is the ERROR-BOUND CHECK (estimate
    // within 5% ≈ 3σ at lgK=12), not the raw estimate: the estimate
    // itself is only exact while the sketch sits in coupon mode
    // (small cardinalities), so hashing it is a scale trap — green at
    // sf0.01's 150 users, red at sf0.1's 1500 (observed: 1494 vs
    // 1500). The bound holds at every SF; SketchSpec pins exactness
    // in the coupon regime.
    QueryDef(
      "q_distinct_sketch",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("exact_users"),
            hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
              .as("__est"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("__est").cast("double")
              / col("exact_users").cast("double") - 1.0) <= 0.05)
              .as("sketch_within_5pct"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS sketch_within_5pct
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """)),

    // SCD2 dimension history from the event log: each user's
    // consecutive runs of the same event_type collapse into
    // [valid_from, valid_to) intervals, latest run open. One
    // exchange end-to-end (Scd2 scaladoc; Scd2Spec asserts it).
    // Oracle replays the gaps-and-islands chain with the same
    // (ts, event_id) tiebreak.
    QueryDef(
      "q_scd2",
      (s, dir) =>
        graft.operators.Scd2.fromChangeLog(
            Tables.events(s, dir), keyCols = Seq("user_id"),
            attrCols = Seq("event_type"), tsCol = "ts",
            tieCols = Seq("event_id"))
          .orderBy(col("user_id"), col("valid_from")),
      Some("""
        WITH flagged AS (
          SELECT user_id, event_type, ts, event_id,
                 CASE WHEN lag(event_type, 1) OVER w
                           IS DISTINCT FROM event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        runs AS (
          SELECT user_id, event_type, ts,
                 sum(chg) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run
          FROM flagged),
        collapsed AS (
          SELECT user_id, run, min(event_type) AS event_type,
                 min(ts) AS valid_from
          FROM runs GROUP BY 1, 2)
        SELECT user_id, event_type, valid_from,
               lead(valid_from, 1) OVER wk AS valid_to,
               (lead(valid_from, 1) OVER wk IS NULL) AS is_current
        FROM collapsed
        WINDOW wk AS (PARTITION BY user_id ORDER BY valid_from)
        ORDER BY user_id, valid_from
      """)),

    // The SAME SCD2 semantics as a stream (flatMapGroupsWithState):
    // closed intervals flow downstream as runs end; each key's open
    // run rides in state — so the emitted set is exactly the batch
    // operator's valid_to-non-null rows, and the batch gaps-and-
    // islands chain (in µs) is the oracle.
    QueryDef(
      "q_stream_scd2",
      (s, dir) =>
        StreamingOps.scd2History(s, s"$dir/events.parquet")
          .orderBy(col("user_id"), col("from_us")),
      Some("""
        WITH flagged AS (
          SELECT user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
                 CASE WHEN lag(event_type, 1) OVER w
                           IS DISTINCT FROM event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)),
        runs AS (
          SELECT user_id, event_type, us,
                 sum(chg) OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS run
          FROM flagged),
        collapsed AS (
          SELECT user_id, run, min(event_type) AS event_type,
                 min(us) AS from_us
          FROM runs GROUP BY 1, 2),
        intervals AS (
          SELECT user_id, event_type, from_us,
                 lead(from_us, 1) OVER (PARTITION BY user_id
                                        ORDER BY from_us) AS to_us
          FROM collapsed)
        SELECT user_id, event_type, from_us, to_us
        FROM intervals WHERE to_us IS NOT NULL
        ORDER BY user_id, from_us
      """)),

    // Per-user EWMA (α=0.5) of the event value — a recursive fold no
    // window aggregate expresses (TimeSeries scaladoc). The identical
    // left fold replays in DuckDB as list_reduce over the same
    // (ts, event_id)-ordered list: exact halvings, bit-for-bit.
    QueryDef(
      "q_ewma",
      (s, dir) =>
        graft.operators.TimeSeries.ewmaHalf(
            Tables.events(s, dir), keyCols = Seq("user_id"),
            orderCols = Seq("ts", "event_id"), valueCol = "value")
          .orderBy(col("user_id")),
      Some("""
        SELECT user_id, count(*) AS n,
               ROUND(list_reduce(list(value ORDER BY ts, event_id),
                                 (a, b) -> (a + b) * 0.5), 6) AS ewma
        FROM events
        GROUP BY user_id
        ORDER BY user_id
      """)),

    // Holt linear (double-exponential) smoothing, α=β=1/2: per-user
    // level + trend + one-step forecast — the trend-aware companion
    // to q_ewma, same exact-halving fold discipline (TimeSeries
    // .holtHalf scaladoc), oracle-replayed as a struct-accumulator
    // list_reduce over the identically ordered history.
    QueryDef(
      "q_holt",
      (s, dir) =>
        graft.operators.TimeSeries.holtHalf(
            Tables.events(s, dir), keyCols = Seq("user_id"),
            orderCols = Seq("ts", "event_id"), valueCol = "value")
          .orderBy(col("user_id")),
      Some("""
        -- a list_reduce lambda would be natural here, but DuckDB
        -- computes struct_pack fields sequentially INTO the
        -- accumulator, so the b-field's formula reads the already-
        -- updated l — replay the fold row-by-row instead
        WITH RECURSIVE ordered AS (
          SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS i
          FROM events),
        rec AS (
          SELECT user_id, i, value AS l, CAST(0.0 AS DOUBLE) AS b
          FROM ordered WHERE i = 1
          UNION ALL
          SELECT o.user_id, o.i,
                 0.5 * o.value + 0.5 * (r.l + r.b),
                 0.5 * ((0.5 * o.value + 0.5 * (r.l + r.b)) - r.l)
                   + 0.5 * r.b
          FROM rec r JOIN ordered o
            ON o.user_id = r.user_id AND o.i = r.i + 1),
        last AS (
          SELECT user_id, max(i) AS n FROM rec GROUP BY 1)
        SELECT r.user_id, CAST(l2.n AS BIGINT) AS n,
               ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
               ROUND(r.l + r.b, 6) AS forecast
        FROM rec r JOIN last l2
          ON r.user_id = l2.user_id AND r.i = l2.n
        ORDER BY r.user_id
      """)),

    // Additive Holt-Winters (period 4, α=β=γ=1/2) per user: level +
    // trend + four seasonal slots + the seasonal one-step forecast —
    // the triple-exponential rung above q_holt, same exact-halving
    // fold discipline (TimeSeries.holtWintersHalf scaladoc). The
    // oracle replays the recurrence row-by-row through a recursive
    // CTE carrying the four slots as columns. The shared s_slot and
    // l' subexpressions are INLINED at every use — a lateral alias
    // would silently resolve to the recursive table's same-named
    // column (previous row's value), a DuckDB name-resolution trap
    // this query hit in development; identical expressions produce
    // identical IEEE bits, so inlining preserves the replay.
    QueryDef(
      "q_holt_winters",
      (s, dir) =>
        graft.operators.TimeSeries.holtWintersHalf(
            Tables.events(s, dir), keyCols = Seq("user_id"),
            orderCols = Seq("ts", "event_id"), valueCol = "value")
          .orderBy(col("user_id")),
      Some(holtWintersOracle)),

    // Streaming twin of q_ewma: the α=1/2 recurrence as O(1)
    // mapGroupsWithState per user (one running average in state where
    // the batch operator collects the history); shares q_ewma's
    // list_reduce oracle — the JVM fold is the same IEEE op sequence.
    QueryDef(
      "q_stream_ewma",
      (s, dir) =>
        StreamingOps.ewmaHistory(s, s"$dir/events.parquet")
          .orderBy(col("user_id")),
      Some("""
        SELECT user_id, count(*) AS n,
               ROUND(list_reduce(list(value ORDER BY ts, event_id),
                                 (a, b) -> (a + b) * 0.5), 6) AS ewma
        FROM events
        GROUP BY user_id
        ORDER BY user_id
      """)),

    // Streaming twin of q_holt: the level/trend recurrence as O(1)
    // mapGroupsWithState per user; the JVM fold replays the batch
    // Catalyst expression's exact IEEE op sequence, so the batch
    // oracle checks the stream bit-for-bit.
    QueryDef(
      "q_stream_holt",
      (s, dir) =>
        StreamingOps.holtHistory(s, s"$dir/events.parquet")
          .orderBy(col("user_id")),
      Some("""
        WITH RECURSIVE ordered AS (
          SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS i
          FROM events),
        rec AS (
          SELECT user_id, i, value AS l, CAST(0.0 AS DOUBLE) AS b
          FROM ordered WHERE i = 1
          UNION ALL
          SELECT o.user_id, o.i,
                 0.5 * o.value + 0.5 * (r.l + r.b),
                 0.5 * ((0.5 * o.value + 0.5 * (r.l + r.b)) - r.l)
                   + 0.5 * r.b
          FROM rec r JOIN ordered o
            ON o.user_id = r.user_id AND o.i = r.i + 1),
        last AS (
          SELECT user_id, max(i) AS n FROM rec GROUP BY 1)
        SELECT r.user_id, CAST(l2.n AS BIGINT) AS n,
               ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
               ROUND(r.l + r.b, 6) AS forecast
        FROM rec r JOIN last l2
          ON r.user_id = l2.user_id AND r.i = l2.n
        ORDER BY r.user_id
      """)),

    // Streaming twin of q_holt_winters: level/trend + four seasonal
    // slots as O(1) mapGroupsWithState per user; the JVM fold
    // replays the batch expressions' exact IEEE op sequence, so it
    // shares q_holt_winters' recursive-CTE oracle bit-for-bit
    // (StreamingOps.holtWintersState scaladoc).
    QueryDef(
      "q_stream_holt_winters",
      (s, dir) =>
        StreamingOps.holtWintersHistory(s, s"$dir/events.parquet")
          .orderBy(col("user_id")),
      Some(holtWintersOracle)),

    // Mann-Whitney rank-sum per event type: does the odd-user
    // cohort's value distribution sit higher or lower? Ranks under
    // the (value, event_id) total order make U a pure integer, and
    // the 95% verdict is the 1875·(2U−n_a n_b)² > 2401·n_a n_b(N+1)
    // cross-multiplication — no sqrt, no float (AbTest.rankSum).
    QueryDef(
      "q_mann_whitney",
      (s, dir) => {
        import graft.operators.AbTest
        AbTest.rankSum(
            Tables.events(s, dir),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "value", "event_id")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH r AS (
          SELECT event_type,
                 CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS b,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rnk
          FROM events),
        g AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
                 CAST(sum(CASE WHEN b = 1 THEN rnk ELSE 0 END) AS BIGINT)
                   AS rb
          FROM r GROUP BY 1),
        stat AS (
          SELECT event_type, n_a, n_b,
                 2 * rb - n_b * (n_b + 1) AS u2
          FROM g)
        SELECT event_type, n_a, n_b, u2 // 2 AS u,
               CASE WHEN CAST(1875 AS HUGEINT)
                         * (u2 - n_a*n_b) * (u2 - n_a*n_b)
                       > CAST(2401 AS HUGEINT)
                         * n_a * n_b * (n_a + n_b + 1)
                    THEN CASE WHEN u2 - n_a*n_b > 0
                              THEN 'b_high' ELSE 'b_low' END
                    ELSE 'none' END AS verdict
        FROM stat
        ORDER BY event_type
      """)),

    // Friedman blocked rank ANOVA per user cohort: does the daily
    // event-type MIX differ across the 5 types once each day's level
    // is ranked away (blocks = calendar days, treatments = event
    // types, observation = the day's count — a complete 30x5 design
    // in the fixture)? Doubled-rank integer lattice, DECIMAL-summed
    // squares, one written IEEE sequence per statistic
    // (NonParametric.friedman scaladoc); the oracle replays the
    // complete-block drop, both rank windows, and the tie
    // correction verbatim.
    QueryDef(
      "q_friedman",
      (s, dir) => {
        import graft.operators.NonParametric
        val daily = Tables.events(s, dir)
          .groupBy(pmod(col("user_id"), lit(3L)).as("cohort"),
            to_date(col("ts")).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        NonParametric.friedman(daily, "cohort", "day", "event_type", "cnt")
          .orderBy(col("cohort"))
      },
      Some(s"""
        WITH $friedmanCtes
        SELECT * FROM fr ORDER BY cohort
      """)),

    // Kendall's coefficient of concordance W on the same design read
    // as an agreement question: do the 30 days (raters) rank the 5
    // event types (items) the same way — the multi-rater ordinal
    // companion to q_cohens_kappa's two-rater nominal agreement.
    // Derived from the Friedman identity chi2 = m(k-1)W on the
    // snapped micro lattice via the signed exact integer quotient
    // (NonParametric.kendallW scaladoc), so the oracle is one extra
    // select over the shared Friedman replay.
    QueryDef(
      "q_kendall_w",
      (s, dir) => {
        import graft.operators.NonParametric
        val daily = Tables.events(s, dir)
          .groupBy(pmod(col("user_id"), lit(3L)).as("cohort"),
            to_date(col("ts")).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        NonParametric.kendallW(daily, "cohort", "day", "event_type", "cnt")
          .orderBy(col("cohort"))
      },
      Some(s"""
        WITH $friedmanCtes
        SELECT cohort, n_blocks AS n_raters, k_treatments AS k_items,
               CAST(SIGN(chi2_micro)
                    * (ABS(chi2_micro)
                       // (n_blocks * (k_treatments - 1)))
                 AS BIGINT) AS w_micro,
               CAST(SIGN(chi2_tie_corrected_micro)
                    * (ABS(chi2_tie_corrected_micro)
                       // (n_blocks * (k_treatments - 1)))
                 AS BIGINT) AS w_tie_corrected_micro
        FROM fr ORDER BY cohort
      """)),

    // Page's trend test per user cohort on the SAME blocked design
    // as q_friedman — the ordered-alternative version: does daily
    // volume TREND with the event type's (alphabetical-index) order,
    // once each day's level is ranked away. L2 = Σ cⱼ·R2ⱼ over the
    // shared doubled rank sums, integer E2, classical null variance,
    // one IEEE sequence for z (NonParametric.pageTrend scaladoc).
    QueryDef(
      "q_page",
      (s, dir) => {
        import graft.operators.NonParametric
        val daily = Tables.events(s, dir)
          .groupBy(pmod(col("user_id"), lit(3L)).as("cohort"),
            to_date(col("ts")).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("ord", dense_rank().over(
            Window.partitionBy(col("cohort")).orderBy(col("event_type")))
            .cast("long"))
        NonParametric.pageTrend(daily, "cohort", "day", "ord", "cnt")
          .orderBy(col("cohort"))
      },
      Some("""
        WITH obs AS (
          SELECT user_id % 3 AS cohort, CAST(ts AS DATE) AS b,
                 event_type AS t, CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2, 3),
        obs2 AS (
          SELECT cohort, b,
                 DENSE_RANK() OVER (PARTITION BY cohort ORDER BY t)
                   AS o, x
          FROM obs),
        kp AS (SELECT cohort, count(DISTINCT o) AS k
               FROM obs2 GROUP BY 1),
        comp AS (
          SELECT o2.cohort, o2.b
          FROM obs2 o2 JOIN kp USING (cohort)
          GROUP BY o2.cohort, o2.b, kp.k
          HAVING count(*) = kp.k),
        kept AS (SELECT o2.* FROM obs2 o2 JOIN comp USING (cohort, b)),
        ranked AS (
          SELECT cohort, o,
                 2 * RANK() OVER (PARTITION BY cohort, b ORDER BY x)
                   + COUNT(*) OVER (PARTITION BY cohort, b, x) - 1 AS r2
          FROM kept),
        rt AS (
          SELECT cohort, o, CAST(SUM(r2) AS BIGINT) AS rt
          FROM ranked GROUP BY 1, 2),
        wc AS (
          SELECT cohort,
                 CAST(DENSE_RANK() OVER (PARTITION BY cohort ORDER BY o)
                   AS BIGINT) AS c,
                 rt
          FROM rt),
        nb AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n
               FROM comp GROUP BY 1),
        st AS (
          SELECT cohort, CAST(count(*) AS BIGINT) AS kt,
                 CAST(SUM(c * rt) AS BIGINT) AS l2
          FROM wc GROUP BY 1)
        SELECT st.cohort, nb.n AS n_blocks, st.kt AS k_treatments,
               st.l2,
               nb.n * st.kt * (st.kt + 1) * (st.kt + 1) // 2 AS e2,
               CAST(ROUND(
                 CAST(st.l2 - nb.n * st.kt * (st.kt + 1)
                      * (st.kt + 1) // 2 AS DOUBLE)
                 / (2.0 * sqrt(
                     CAST(nb.n AS DOUBLE) * CAST(st.kt AS DOUBLE)
                     * CAST(st.kt AS DOUBLE)
                     * (CAST(st.kt AS DOUBLE) + 1.0)
                     * (CAST(st.kt AS DOUBLE) + 1.0)
                     * (CAST(st.kt AS DOUBLE) - 1.0) / 144.0))
                 * 1e6) AS BIGINT) AS z_micro
        FROM st JOIN nb USING (cohort)
        WHERE st.kt >= 2 AND nb.n >= 2
        ORDER BY st.cohort
      """)),

    // Conover's post-hoc for the blocked design on the SAME daily
    // layout as q_friedman: which event-type PAIRS differ once each
    // day's level is ranked away — the blocked twin of
    // q_conover_posthoc. The shared doubled lattice keeps
    // n·A1 − ΣR_j² an exact DECIMAL integer; one IEEE sequence per
    // pair; enumeration k²-bounded over the treatment-stats table
    // (NonParametric.friedmanPosthoc scaladoc).
    QueryDef(
      "q_friedman_posthoc",
      (s, dir) => {
        import graft.operators.NonParametric
        val daily = Tables.events(s, dir)
          .groupBy(pmod(col("user_id"), lit(3L)).as("cohort"),
            to_date(col("ts")).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        NonParametric.friedmanPosthoc(
            daily, "cohort", "day", "event_type", "cnt")
          .orderBy(col("cohort"), col("g1"), col("g2"))
      },
      Some(s"""
        WITH $friedmanCtes,
        a12 AS (
          SELECT cohort, SUM(CAST(r2 AS HUGEINT) * r2) AS a12
          FROM ranked GROUP BY 1),
        rsq AS (
          SELECT cohort, SUM(CAST(rt AS HUGEINT) * rt) AS rsq,
                 CAST(count(*) AS BIGINT) AS k
          FROM rt GROUP BY 1),
        den AS (
          SELECT a12.cohort, nb.n, rsq.k,
                 CAST(nb.n AS HUGEINT) * a12.a12 - rsq.rsq AS numer
          FROM a12 JOIN rsq USING (cohort) JOIN nb USING (cohort)
          WHERE nb.n >= 2 AND rsq.k >= 2
            AND CAST(nb.n AS HUGEINT) * a12.a12 > rsq.rsq)
        SELECT a.cohort, a.t AS g1, b.t AS g2,
               den.n AS n_blocks, den.k AS k_treatments,
               CAST(ROUND(CAST(a.rt - b.rt AS DOUBLE) / 2.0
                    / sqrt(2.0 * (CAST(den.numer AS DOUBLE) / 4.0)
                           / ((CAST(den.n AS DOUBLE) - 1.0)
                              * (CAST(den.k AS DOUBLE) - 1.0)))
                    * 1e6) AS BIGINT) AS t_micro
        FROM rt a
        JOIN rt b ON a.cohort = b.cohort AND a.t < b.t
        JOIN den ON den.cohort = a.cohort
        ORDER BY a.cohort, g1, g2
      """)),

    // Quade range-weighted blocked test on the SAME daily design as
    // q_friedman: does the event-type mix differ once each day's
    // level is ranked away — but with days WEIGHTED by how far their
    // five counts spread (the doubled midrank of the day's max−min
    // range), so high-signal days dominate where Friedman gives
    // every day one vote. 4×-scaled integer scores
    // S4 = Q2·(r2 − (k+1)), DECIMAL-exact A4/SB4, and the 16× scale
    // cancels in the single IEEE division that forms F
    // (NonParametric.quade scaladoc).
    QueryDef(
      "q_quade",
      (s, dir) => {
        import graft.operators.NonParametric
        val daily = Tables.events(s, dir)
          .groupBy(pmod(col("user_id"), lit(3L)).as("cohort"),
            to_date(col("ts")).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        NonParametric.quade(daily, "cohort", "day", "event_type", "cnt")
          .orderBy(col("cohort"))
      },
      Some("""
        WITH obs AS (
          SELECT user_id % 3 AS cohort, CAST(ts AS DATE) AS b,
                 event_type AS t, CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2, 3),
        kp AS (SELECT cohort, count(DISTINCT t) AS k FROM obs GROUP BY 1),
        comp AS (
          SELECT o.cohort, o.b
          FROM obs o JOIN kp USING (cohort)
          GROUP BY o.cohort, o.b, kp.k
          HAVING count(*) = kp.k),
        kept AS (SELECT o.* FROM obs o JOIN comp USING (cohort, b)),
        ranked AS (
          SELECT cohort, b, t,
                 2 * RANK() OVER (PARTITION BY cohort, b ORDER BY x)
                   + COUNT(*) OVER (PARTITION BY cohort, b, x) - 1 AS r2
          FROM kept),
        rng AS (
          SELECT cohort, b, MAX(x) - MIN(x) AS rg
          FROM kept GROUP BY 1, 2),
        wts AS (
          SELECT cohort, b,
                 2 * RANK() OVER (PARTITION BY cohort ORDER BY rg)
                   + COUNT(*) OVER (PARTITION BY cohort, rg) - 1 AS q2
          FROM rng),
        scored AS (
          SELECT r.cohort, r.t,
                 CAST(w.q2 * (r.r2 - (kp.k + 1)) AS BIGINT) AS s4
          FROM ranked r
          JOIN wts w ON w.cohort = r.cohort AND w.b = r.b
          JOIN kp ON kp.cohort = r.cohort),
        pt AS (
          SELECT cohort, t,
                 SUM(CAST(s4 AS DECIMAL(38,0))) AS sj,
                 SUM(CAST(s4 AS DECIMAL(38,0))
                     * CAST(s4 AS DECIMAL(38,0))) AS a4j,
                 CAST(count(*) AS BIGINT) AS nb
          FROM scored GROUP BY 1, 2),
        st AS (
          SELECT cohort, CAST(count(*) AS BIGINT) AS kt,
                 MAX(nb) AS n,
                 SUM(a4j) AS a4,
                 SUM(sj * sj) AS sb4
          FROM pt GROUP BY 1)
        SELECT cohort, n AS n_blocks, kt AS k_treatments,
               CAST(ROUND(
                 (CAST(n AS DOUBLE) - 1.0) * CAST(sb4 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(a4 AS DOUBLE)
                    - CAST(sb4 AS DOUBLE))
                 * 1000000.0) AS BIGINT) AS f_micro
        FROM st
        WHERE kt >= 2 AND n >= 2
          AND CAST(n AS DECIMAL(38,0)) * a4 > sb4
        ORDER BY cohort
      """)),

    // Two-sample Kolmogorov-Smirnov per event type: did the odd-user
    // cohort's value DISTRIBUTION shift (not just its mean — the
    // Mann-Whitney question)? D = max|cumA·n_b − cumB·n_a|/(n_a·n_b)
    // over the merged (value, event_id) order — integers until one
    // edge division; verdict by maxdiff²·10⁴ > 18442·n_a n_b(N)
    // cross-multiplication (DistributionTests scaladoc).
    QueryDef(
      "q_ks_test",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.ksTwoSample(
            Tables.events(s, dir),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "value", "event_id")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_type,
                 CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS b,
                 value, event_id
          FROM events),
        m AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END)
                      OVER wr AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END)
                      OVER wr AS BIGINT) AS cb,
                 CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END)
                      OVER wg AS BIGINT) AS na,
                 CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END)
                      OVER wg AS BIGINT) AS nb
          FROM e
          WINDOW wr AS (PARTITION BY event_type
                        ORDER BY value, event_id
                        ROWS UNBOUNDED PRECEDING),
                 wg AS (PARTITION BY event_type)),
        a AS (
          SELECT event_type, max(na) AS n_a, max(nb) AS n_b,
                 max(abs(ca * nb - cb * na)) AS maxdiff
          FROM m GROUP BY 1)
        SELECT event_type, n_a, n_b,
               ROUND(CAST(maxdiff AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
                 AS ks_d,
               CASE WHEN CAST(maxdiff AS HUGEINT) * maxdiff * 10000
                       > CAST(18442 AS HUGEINT) * n_a * n_b
                         * (n_a + n_b)
                    THEN 'shifted' ELSE 'same' END AS verdict
        FROM a
        ORDER BY event_type
      """)),

    // Two-sample Cramér-von Mises on the SAME cohort split as
    // q_ks_test, reading integer cents: where KS takes only the
    // single largest ECDF gap, CvM integrates the SQUARED gap over
    // the whole distribution — many small persistent differences
    // register here while KS stays quiet. Doubled midrank lattice,
    // order-invariant intra-tie indexes, exact integer U4 = 4U, one
    // IEEE sequence for T (DistributionTests.cramerVonMises
    // scaladoc).
    QueryDef(
      "q_cvm_test",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.cramerVonMises(
            Tables.events(s, dir)
              .select(col("event_type"), col("user_id"),
                round(col("value") * 100).cast("long").as("cents")),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "cents")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, user_id % 2 = 1 AS b,
                 CAST(ROUND(value * 100) AS BIGINT) AS x
          FROM events),
        r AS (
          SELECT event_type, b,
                 (2 * RANK() OVER (PARTITION BY event_type ORDER BY x)
                    + COUNT(*) OVER (PARTITION BY event_type, x) - 1)
                   - 2 * ROW_NUMBER() OVER (PARTITION BY event_type, b
                                            ORDER BY x) AS d
          FROM e),
        pc AS (
          SELECT event_type, b, CAST(count(*) AS BIGINT) AS n,
                 SUM(CAST(d AS HUGEINT) * d) AS s
          FROM r GROUP BY 1, 2),
        j AS (
          SELECT a.event_type, a.n AS n_a, b.n AS n_b,
                 CAST(a.n AS HUGEINT) * a.s
                   + CAST(b.n AS HUGEINT) * b.s AS u4
          FROM pc a JOIN pc b
            ON a.event_type = b.event_type AND NOT a.b AND b.b)
        SELECT event_type, n_a, n_b, CAST(u4 AS BIGINT) AS u4,
               CAST(ROUND((CAST(u4 AS DOUBLE) / 4.0
                      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                         * CAST(n_a + n_b AS DOUBLE))
                      - (4.0 * CAST(n_a AS DOUBLE)
                         * CAST(n_b AS DOUBLE) - 1.0)
                        / (6.0 * CAST(n_a + n_b AS DOUBLE)))
                     * 1e6) AS BIGINT) AS t_micro
        FROM j
        ORDER BY event_type
      """)),

    // Population Stability Index per event type on the SAME cohort
    // split as q_ks_test, over 10-dollar value bins — the
    // ML-monitoring industry's drift number with its conventional
    // 0.1/0.25 action bands, reported beside the sharper
    // distribution tests. Laplace-smoothed shares over the union of
    // occupied bins; per-bin contributions are one IEEE sequence
    // nano-snapped and integer-summed
    // (DistributionTests.psi scaladoc).
    QueryDef(
      "q_psi",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.psi(
            Tables.events(s, dir)
              .select(col("event_type"), col("user_id"),
                expr("CAST(ROUND(value * 100) AS BIGINT) div 1000")
                  .as("bin")),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "bin")
          .orderBy(col("event_type"))
      },
      Some(psiOracle)),

    // Streaming twin of q_psi — the live drift dashboard number as
    // mapGroupsWithState: state is one bin→count map per cohort
    // (O(occupied bins), never the row count) and every trigger
    // replays the batch operator's exact per-bin nano lattice (the
    // HALF_UP snap replicated bit-for-bit). Map folds commute, so
    // micro-batch splits cannot change the result; shares q_psi's
    // oracle (StreamingOps.psiState scaladoc).
    QueryDef(
      "q_stream_psi",
      (s, dir) =>
        graft.streaming.StreamingOps.psiHistory(
            s, s"$dir/events.parquet")
          .orderBy(col("event_type")),
      Some(psiOracle)),

    // PSI with ENGINE-DERIVED equal-frequency bins on the raw cents
    // values — q_psi requires the caller to pre-bucket (explicit
    // 10-dollar bins); here the 9 interior edges are the reference
    // cohort's exact equal-frequency quantiles (lower order
    // statistics on the cross-multiplied integral threshold), so
    // drift monitoring needs no caller-side pass over 100 TB to
    // decide edges and the whole chain stays oracle-replayable
    // (DistributionTests.psiBinned scaladoc).
    QueryDef(
      "q_psi_binned",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.psiBinned(
            Tables.events(s, dir)
              .select(col("event_type"), col("user_id"),
                expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents")),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "cents", nBins = 10)
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, user_id % 2 = 1 AS b,
                 CAST(ROUND(value * 100) AS BIGINT) AS x
          FROM events),
        rv AS (
          SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c
          FROM e WHERE NOT b GROUP BY 1, 2),
        cum AS (
          SELECT event_type, x,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY x)
                   AS cw,
                 SUM(c) OVER (PARTITION BY event_type) AS n
          FROM rv),
        ed AS (
          SELECT event_type, q.i, MIN(x) AS e
          FROM cum CROSS JOIN
               (SELECT unnest(range(1, 10)) AS i) q
          WHERE cw * 10 >= n * q.i
          GROUP BY 1, 2),
        edd AS (SELECT DISTINCT event_type, e FROM ed),
        vals AS (SELECT DISTINCT event_type, x FROM e
                 WHERE event_type IN (SELECT event_type FROM edd)),
        vb AS (
          SELECT v.event_type, v.x, CAST(COUNT(d.e) AS BIGINT) AS bin
          FROM vals v LEFT JOIN edd d
            ON d.event_type = v.event_type AND d.e <= v.x
          GROUP BY 1, 2),
        eb AS (
          SELECT e.event_type, e.b, vb.bin
          FROM e JOIN vb
            ON vb.event_type = e.event_type AND vb.x = e.x),
        pb AS (
          SELECT event_type, bin,
                 CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
          FROM eb GROUP BY 1, 2),
        mk AS (
          SELECT *,
                 SUM(ca) OVER (PARTITION BY event_type) AS na,
                 SUM(cb) OVER (PARTITION BY event_type) AS nb,
                 COUNT(*) OVER (PARTITION BY event_type) AS nbins
          FROM pb),
        tm AS (
          SELECT event_type, na, nb, nbins,
                 CAST(ROUND((
                     (CAST(ca AS DOUBLE) + 1.0)
                       / (CAST(na AS DOUBLE) + CAST(nbins AS DOUBLE))
                   - (CAST(cb AS DOUBLE) + 1.0)
                       / (CAST(nb AS DOUBLE) + CAST(nbins AS DOUBLE)))
                   * ln(((CAST(ca AS DOUBLE) + 1.0)
                         / (CAST(na AS DOUBLE)
                            + CAST(nbins AS DOUBLE)))
                        / ((CAST(cb AS DOUBLE) + 1.0)
                           / (CAST(nb AS DOUBLE)
                              + CAST(nbins AS DOUBLE))))
                   * 1e9) AS BIGINT) AS t
          FROM mk)
        SELECT event_type,
               CAST(MAX(na) AS BIGINT) AS n_a,
               CAST(MAX(nb) AS BIGINT) AS n_b,
               CAST(MAX(nbins) AS BIGINT) AS n_bins,
               CAST(ROUND(CAST(SUM(t) AS DOUBLE) / 1e9 * 1e6)
                 AS BIGINT) AS psi_micro
        FROM tm GROUP BY 1
        HAVING MAX(na) > 0 AND MAX(nb) > 0
        ORDER BY event_type
      """)),

    // Two-sample energy distance on the SAME cohort split as
    // q_ks_test / q_cvm_test — the metric-space test consistent
    // against EVERY fixed alternative: the pairwise |x−y| sums are
    // never formed as pairs, collapsing to cumulative count/sum
    // windows on the merged order (O(N log N), exact DECIMAL
    // accumulation); intra-tie window order provably cannot move any
    // sum, so both engines agree without a tie-break column
    // (DistributionTests.energyDistance scaladoc).
    QueryDef(
      "q_energy_test",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.energyDistance(
            Tables.events(s, dir)
              .select(col("event_type"), col("user_id"),
                round(col("value") * 100).cast("long").as("cents")),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "cents")
          .orderBy(col("event_type"))
      },
      Some(energyOracle)),

    // Streaming twin of q_energy_test — the distribution-drift
    // monitor as mapGroupsWithState: cohort A plays the reference
    // window, cohort B the live feed, and every trigger re-derives
    // the exact pairwise-sum statistics from two value→count maps
    // (state is O(distinct values), never the row count; the replay
    // walks merged sorted values once, the same O(D) collapse the
    // batch operator expresses as windows). Map folds commute, so
    // micro-batch splits cannot change the result; shares
    // q_energy_test's oracle (StreamingOps.energyState scaladoc).
    QueryDef(
      "q_stream_energy",
      (s, dir) =>
        graft.streaming.StreamingOps.energyHistory(
            s, s"$dir/events.parquet")
          .orderBy(col("event_type")),
      Some(energyOracle)),

    // Poisson-bootstrap 95% CI on the conversion rate: 200 replicate
    // rates from ONE corpus pass (per-row Poisson(1) weights from a
    // 31-bit LCG both engines evaluate exactly — Bootstrap scaladoc),
    // reported as exact order statistics, no float summation. The
    // scale story IS the operator: B resamples without a single
    // resampling shuffle.
    QueryDef(
      "q_bootstrap_ci",
      (s, dir) => {
        import graft.operators.Bootstrap
        Bootstrap.rateCI(
            Tables.events(s, dir).select(col("event_id"), col("value")),
            "event_id", col("value") > 50.0, b = 200)
          .orderBy(col("stat"))
      },
      Some("""
        WITH reps AS (SELECT unnest(range(0, 200)) AS rep),
        base AS (
          SELECT event_id AS id,
                 CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS s
          FROM events),
        d AS (
          SELECT rep, s,
                 xor(((id % 2147483648) * 2654435761) % 2147483648,
                     ((rep % 2147483648) * 2246822519) % 2147483648)
                   AS seed
          FROM base CROSS JOIN reps),
        d1 AS (
          SELECT rep, s,
                 (seed * 1103515245 + 12345) % 2147483648 AS s1
          FROM d),
        d2 AS (
          SELECT rep, s, xor(s1, s1 >> 15) AS s2 FROM d1),
        u AS (
          SELECT rep, s,
                 CAST((s2 * 32310901 + 1013904223) % 2147483648 AS DOUBLE)
                   / 2147483648.0 AS u
          FROM d2),
        w AS (
          SELECT rep, s,
                 CASE WHEN u < 0.367879 THEN 0
                      WHEN u < 0.735759 THEN 1
                      WHEN u < 0.919699 THEN 2
                      WHEN u < 0.981012 THEN 3
                      WHEN u < 0.996340 THEN 4
                      WHEN u < 0.999406 THEN 5
                      ELSE 6 END AS w
          FROM u),
        rates AS (
          SELECT rep, CAST(sum(w) AS BIGINT) AS n_eff,
                 ROUND(CAST(sum(w * s) AS DOUBLE)
                       / CAST(sum(w) AS BIGINT), 6) AS rate
          FROM w GROUP BY rep),
        ranked AS (
          SELECT rep, n_eff, rate,
                 ROW_NUMBER() OVER (ORDER BY rate, rep) AS rn
          FROM rates)
        SELECT CASE WHEN rn = 5 THEN 'p025' WHEN rn = 100 THEN 'p500'
                    ELSE 'p975' END AS stat, rep, n_eff, rate
        FROM ranked WHERE rn IN (5, 100, 196)
        ORDER BY stat
      """)),

    // Ingestion-volume anomaly alarm: hourly buckets more than 2σ
    // from their event type's own mean, z-tested in pure integer
    // arithmetic — (c·H−S)² > 4·(H·SS−S²), no sqrt, no float — so
    // the flag set is engine- and partitioning-exact (TimeSeries
    // .anomalousCounts scaladoc).
    QueryDef(
      "q_event_anomaly",
      (s, dir) =>
        graft.operators.TimeSeries.anomalousCounts(
            Tables.events(s, dir), "event_type", "ts", z = 2)
          .orderBy(col("event_type"), col("hour_start")),
      Some("""
        WITH c AS (
          SELECT event_type,
                 CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                   AS hour_start,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT event_type, count(*) AS h,
                 CAST(sum(n) AS BIGINT) AS s,
                 CAST(sum(n * n) AS BIGINT) AS ss
          FROM c GROUP BY 1)
        SELECT c.event_type, c.hour_start, c.n,
               CASE WHEN c.n * st.h - st.s > 0 THEN 'high'
                    ELSE 'low' END AS side
        FROM c JOIN st USING (event_type)
        WHERE (c.n * st.h - st.s) * (c.n * st.h - st.s)
              > 4 * (st.h * st.ss - st.s * st.s)
        ORDER BY c.event_type, c.hour_start
      """)),

    // The SAME alarm with the counts accumulated by a watermarked
    // streaming window aggregation — identical flag set by
    // construction (integer z-test over the materialized counts), so
    // it shares q_event_anomaly's batch oracle.
    QueryDef(
      "q_stream_anomaly",
      (s, dir) =>
        graft.streaming.StreamingOps
          .anomalousCountStream(s, s"$dir/events.parquet", z = 2)
          .orderBy(col("event_type"), col("hour_start")),
      Some("""
        WITH c AS (
          SELECT event_type,
                 CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                   AS hour_start,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT event_type, count(*) AS h,
                 CAST(sum(n) AS BIGINT) AS s,
                 CAST(sum(n * n) AS BIGINT) AS ss
          FROM c GROUP BY 1)
        SELECT c.event_type, c.hour_start, c.n,
               CASE WHEN c.n * st.h - st.s > 0 THEN 'high'
                    ELSE 'low' END AS side
        FROM c JOIN st USING (event_type)
        WHERE (c.n * st.h - st.s) * (c.n * st.h - st.s)
              > 4 * (st.h * st.ss - st.s * st.s)
        ORDER BY c.event_type, c.hour_start
      """)),

    // Interval × interval overlap join: concurrent-session pairs
    // across the user-population split (users < 75 vs >= 75), session
    // spans from the 1800 s gap rule. Declaratively this is a pure
    // inequality join (cartesian plan); RangeJoin.bucketedIntervalOverlap
    // grid-blocks both sides into 1-hour buckets and emits each pair
    // in its first shared bucket — one bucket-keyed shuffle, no
    // distinct pass. Oracle runs the naive theta join.
    QueryDef(
      "q_interval_join",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        val spans = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
          .withColumn("pus", lag(col("us"), 1).over(w))
          .withColumn("brk",
            when(col("pus").isNull ||
              col("us") - col("pus") > 1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("sid", sum(col("brk")).over(w))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("us")).as("st"), max(col("us")).as("en"))
        val a = spans.filter(col("user_id") < 75)
          .select(col("user_id").as("a_user"), col("sid").as("a_sid"),
            col("st").as("a_st"), col("en").as("a_en"))
        val b = spans.filter(col("user_id") >= 75)
          .select(col("user_id").as("b_user"), col("sid").as("b_sid"),
            col("st").as("b_st"), col("en").as("b_en"))
        RangeJoin.bucketedIntervalOverlap(
            a, "a_st", "a_en", b, "b_st", "b_en",
            bucketWidth = 3600e6)
          .select(col("a_user"), col("a_sid"), col("b_user"), col("b_sid"),
            (least(col("a_en"), col("b_en")) -
              greatest(col("a_st"), col("b_st"))).as("overlap_us"))
          .orderBy(col("a_user"), col("a_sid"), col("b_user"), col("b_sid"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        d AS (
          SELECT user_id, us,
                 lag(us) OVER (PARTITION BY user_id ORDER BY us) AS pus
          FROM e),
        m AS (
          SELECT user_id, us,
                 CASE WHEN pus IS NULL OR us - pus > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM d),
        ss AS (
          SELECT user_id, us,
                 CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us)
                      AS BIGINT) AS sid
          FROM m),
        spans AS (
          SELECT user_id, sid, min(us) AS st, max(us) AS en
          FROM ss GROUP BY 1, 2)
        SELECT a.user_id AS a_user, a.sid AS a_sid,
               b.user_id AS b_user, b.sid AS b_sid,
               CAST(least(a.en, b.en) - greatest(a.st, b.st) AS BIGINT)
                 AS overlap_us
        FROM spans a JOIN spans b
          ON a.user_id < 75 AND b.user_id >= 75
         AND a.st <= b.en AND b.st <= a.en
        ORDER BY a_user, a_sid, b_user, b_sid
      """)),

    // Event-path mining: per-user ordered event-type trigrams (the
    // Markov-chain / user-journey kernel), counted corpus-wide, top
    // 25 by (n desc, path asc) — deterministic through the tie group
    // the cut splits. One window exchange keyed by user, one
    // path-keyed aggregation, bounded TakeOrdered final.
    QueryDef(
      "q_session_paths",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("event_type"))
          .withColumn("t1", lead(col("event_type"), 1).over(w))
          .withColumn("t2", lead(col("event_type"), 2).over(w))
          .where(col("t1").isNotNull && col("t2").isNotNull)
          .select(concat_ws(">", col("event_type"), col("t1"), col("t2"))
            .as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(25)
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
          FROM events),
        p AS (
          SELECT event_type,
                 lead(event_type, 1) OVER w AS t1,
                 lead(event_type, 2) OVER w AS t2
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        paths AS (
          SELECT event_type || '>' || t1 || '>' || t2 AS path
          FROM p WHERE t1 IS NOT NULL AND t2 IS NOT NULL)
        SELECT path, CAST(count(*) AS BIGINT) AS n
        FROM paths GROUP BY 1
        ORDER BY n DESC, path LIMIT 25
      """)),

    // Rolling-window feature backfill (training-feature engineering):
    // per-user ROWS-frame rolling mean/max over the trailing 5 events
    // plus the lag delta — one window exchange serves all three. The
    // frame sum rides DECIMAL(18,2) so accumulation order can't
    // perturb the 6-dp mean; max and the lag subtraction are
    // order-safe doubles.
    QueryDef(
      "q_rolling_features",
      (s, dir) => {
        val wo = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val w5 = wo.rowsBetween(-4, 0)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .select(col("event_id"), col("user_id"), col("value"),
            round(sum(col("value").cast(DecimalType(18, 2))).over(w5)
              .cast("double") / count(lit(1)).over(w5), 6)
              .as("roll_avg5"),
            max(col("value")).over(w5).as("roll_max5"),
            (col("value") - lag(col("value"), 1).over(wo)).as("delta"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
          FROM events)
        SELECT event_id, user_id, value,
               ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w5
                          AS DOUBLE) / (count(*) OVER w5), 6)
                 AS roll_avg5,
               max(value) OVER w5 AS roll_max5,
               value - lag(value) OVER wo AS delta
        FROM e
        WINDOW wo AS (PARTITION BY user_id ORDER BY us, event_id),
               w5 AS (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
      """)),

    // Last-touch attribution: each purchase claims the same user's
    // most recent strictly-earlier click/view (id, channel, and µs
    // gap come from the SAME row because all three last_value frames
    // share one total order). One user-keyed window exchange over the
    // full stream, then the purchase filter — no self-join, so the
    // 100-TB shape is a single shuffle keyed by the user.
    QueryDef(
      "q_attribution",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val isTouch = col("event_type").isin("click", "view")
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("touch_event_id",
            last(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
          .withColumn("touch_type",
            last(when(isTouch, col("event_type")), ignoreNulls = true)
              .over(w))
          .withColumn("touch_us",
            last(when(isTouch, col("us")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("touch_event_id"),
            col("touch_type"),
            (col("us") - col("touch_us")).as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        t AS (
          SELECT event_id, user_id, event_type, us,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN event_id END IGNORE NULLS) OVER w
                   AS touch_event_id,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN event_type END IGNORE NULLS) OVER w
                   AS touch_type,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN us END IGNORE NULLS) OVER w
                   AS touch_us
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING))
        SELECT event_id, user_id, touch_event_id, touch_type,
               us - touch_us AS gap_us
        FROM t WHERE event_type = 'purchase'
        ORDER BY event_id
      """)),

    // Debounce: drop an event when the same user emitted the same
    // event type within the trailing hour — the telemetry-retry /
    // double-fire cleanup that runs before any funnel or attribution
    // analysis. Pure lag comparison on the (user, type) window: one
    // exchange, no state beyond a single predecessor row.
    QueryDef(
      "q_debounce",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("us"), col("event_id"))
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .filter(col("prev_us").isNull ||
            col("us") - col("prev_us") > lit(3600000000L))
          .select(col("event_id"), col("user_id"), col("event_type"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        l AS (
          SELECT event_id, user_id, event_type, us,
                 lag(us) OVER (PARTITION BY user_id, event_type
                               ORDER BY us, event_id) AS prev_us
          FROM e)
        SELECT event_id, user_id, event_type
        FROM l
        WHERE prev_us IS NULL OR us - prev_us > 3600000000
        ORDER BY event_id
      """)),

    // Click/view-to-purchase latency: the exact LOWER median of the
    // attribution gap per channel, selected by rank ((n+1) div 2
    // under the (gap, event_id) total order) rather than interpolated
    // — engines disagree on even-n interpolation, never on element
    // selection. Composes the attribution window pass; one extra
    // channel-keyed window for the rank.
    QueryDef(
      "q_step_latency",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val isTouch = col("event_type").isin("click", "view")
        val gaps = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("touch_type",
            last(when(isTouch, col("event_type")), ignoreNulls = true)
              .over(w))
          .withColumn("touch_us",
            last(when(isTouch, col("us")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" &&
            col("touch_us").isNotNull)
          .select(col("event_id"), col("touch_type"),
            (col("us") - col("touch_us")).as("gap_us"))
        val wr = Window.partitionBy(col("touch_type"))
          .orderBy(col("gap_us"), col("event_id"))
        val wn = Window.partitionBy(col("touch_type"))
        gaps
          .withColumn("rnk", row_number().over(wr))
          .withColumn("n", count(lit(1)).over(wn))
          .filter(col("rnk") === (col("n") + 1).divide(2).cast("long"))
          .select(col("touch_type"), col("n"),
            col("gap_us").as("median_gap_us"))
          .orderBy(col("touch_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        t AS (
          SELECT event_id, event_type, us,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN event_type END IGNORE NULLS) OVER w
                   AS touch_type,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN us END IGNORE NULLS) OVER w
                   AS touch_us
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING)),
        gaps AS (
          SELECT event_id, touch_type, us - touch_us AS gap_us
          FROM t
          WHERE event_type = 'purchase' AND touch_us IS NOT NULL),
        ranked AS (
          SELECT touch_type, event_id, gap_us,
                 ROW_NUMBER() OVER (PARTITION BY touch_type
                                    ORDER BY gap_us, event_id) AS rnk,
                 COUNT(*) OVER (PARTITION BY touch_type) AS n
          FROM gaps)
        SELECT touch_type, CAST(n AS BIGINT) AS n,
               gap_us AS median_gap_us
        FROM ranked
        WHERE rnk = (n + 1) // 2
        ORDER BY touch_type
      """)),

    // Streaming twin of q_debounce: one last-SEEN timestamp of state
    // per (user, type) — lag semantics, a suppressed row still
    // extends the window — sharing the batch oracle.
    QueryDef(
      "q_stream_debounce",
      (s, dir) =>
        StreamingOps.debounceHistory(
            s, s"$dir/events.parquet", gapUs = 3600000000L)
          .orderBy(col("event_id")),
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        l AS (
          SELECT event_id, user_id, event_type, us,
                 lag(us) OVER (PARTITION BY user_id, event_type
                               ORDER BY us, event_id) AS prev_us
          FROM e)
        SELECT event_id, user_id, event_type
        FROM l
        WHERE prev_us IS NULL OR us - prev_us > 3600000000
        ORDER BY event_id
      """)),

    // Streaming twin of q_attribution: last-touch state per user via
    // flatMapGroupsWithState (O(1) state per user — one Touch row),
    // purchases emitting as they arrive. Same oracle as the batch
    // window pass, proving stateful replay ≡ window replay.
    QueryDef(
      "q_stream_attribution",
      (s, dir) =>
        StreamingOps.attributionHistory(s, s"$dir/events.parquet")
          .orderBy(col("event_id")),
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        t AS (
          SELECT event_id, user_id, event_type, us,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN event_id END IGNORE NULLS) OVER w
                   AS touch_event_id,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN event_type END IGNORE NULLS) OVER w
                   AS touch_type,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN us END IGNORE NULLS) OVER w
                   AS touch_us
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING))
        SELECT event_id, user_id, touch_event_id, touch_type,
               us - touch_us AS gap_us
        FROM t WHERE event_type = 'purchase'
        ORDER BY event_id
      """)),

    // A/B experiment readout: odd-user cohort vs even-user cohort,
    // conversion = value > 50, per event type. The z-test verdict is
    // exact integer arithmetic (AbTest scaladoc: z²=2401/625 cross-
    // multiplied, DECIMAL interior) — one map-side-combined groupBy,
    // no join, no window, so both engines agree bit-for-bit.
    QueryDef(
      "q_ab_test",
      (s, dir) => {
        import graft.operators.AbTest
        AbTest.twoProportion(
            Tables.events(s, dir),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            col("value") > 50.0)
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_type,
                 CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS b,
                 CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS s
          FROM events),
        g AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(sum(CASE WHEN b = 0 THEN s ELSE 0 END) AS BIGINT)
                   AS c_a,
                 CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
                 CAST(sum(CASE WHEN b = 1 THEN s ELSE 0 END) AS BIGINT)
                   AS c_b
          FROM e GROUP BY 1)
        SELECT event_type, n_a, c_a, n_b, c_b,
               CASE WHEN CAST(625 AS HUGEINT)
                         * (c_a*n_b - c_b*n_a) * (c_a*n_b - c_b*n_a)
                         * (n_a + n_b)
                       > CAST(2401 AS HUGEINT)
                         * (c_a + c_b) * ((n_a + n_b) - (c_a + c_b))
                         * n_a * n_b
                    THEN CASE WHEN c_a*n_b - c_b*n_a > 0
                              THEN 'a' ELSE 'b' END
                    ELSE 'none' END AS winner
        FROM g
        ORDER BY event_type
      """)),

    // Offline CUSUM change point over each event type's daily count
    // series: argmax_i |n·S_i| on the exact integer lattice
    // (ChangePoint.cusum scaladoc). One window pass per series + one
    // per-series aggregation.
    QueryDef(
      "q_changepoint",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("day"))))
        graft.operators.ChangePoint.cusum(daily, "event_type", "i", "x")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH series AS (
          SELECT event_type,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) AS i
          FROM series),
        pre AS (
          SELECT event_type, i, x,
                 SUM(x) OVER (PARTITION BY event_type ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS ps
          FROM idx),
        tot AS (
          SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx
          FROM idx GROUP BY 1),
        nsi AS (
          SELECT p.event_type, p.i, t.n,
                 CAST(t.n * p.ps - p.i * t.sx AS BIGINT) AS nsi
          FROM pre p JOIN tot t USING (event_type)
          WHERE t.n >= 2 AND p.i < t.n),
        best AS (
          SELECT event_type, i AS change_idx, nsi AS ns_dev, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY abs(nsi) DESC, i) AS rn
          FROM nsi)
        SELECT event_type, change_idx, ns_dev, n
        FROM best WHERE rn = 1
        ORDER BY event_type
      """)),

    // Per-series autocorrelation at lags 1..3 on the n²-scaled exact
    // integer lattice (ChangePoint.autocorr scaladoc): is event
    // volume persistent day-over-day, and at what horizon?
    QueryDef(
      "q_acf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("day"))))
        graft.operators.ChangePoint.autocorr(
            daily, "event_type", "i", "x", maxLag = 3)
          .select(col("event_type"), col("lag"), col("n"), col("r_micro"))
          .orderBy(col("event_type"), col("lag"))
      },
      Some("""
        WITH series AS (
          SELECT event_type,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, CAST(x AS BIGINT) AS x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) AS i
          FROM series),
        tot AS (
          SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM idx GROUP BY 1),
        lags AS (SELECT unnest([1, 2, 3]) AS lag),
        pairs AS (
          SELECT h.event_type, l.lag, h.x AS xh, t.x AS xt
          FROM idx h
          CROSS JOIN lags l
          JOIN idx t ON t.event_type = h.event_type
                    AND t.i = h.i + l.lag),
        perlag AS (
          SELECT event_type, lag,
                 CAST(SUM(xh * xt) AS BIGINT) AS sxy,
                 CAST(SUM(xh) AS BIGINT) AS sh,
                 CAST(SUM(xt) AS BIGINT) AS st
          FROM pairs GROUP BY 1, 2)
        SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag, t.n,
               CAST(ROUND(
                 CAST(t.n * t.n * p.sxy
                      - t.n * t.sx * (p.sh + p.st)
                      + (t.n - p.lag) * t.sx * t.sx AS DOUBLE) * 1e6
                 / CAST(t.n * t.n * t.sxx - t.n * t.sx * t.sx AS DOUBLE))
                 AS BIGINT) AS r_micro
        FROM perlag p JOIN tot t USING (event_type)
        WHERE t.n * t.sxx <> t.sx * t.sx
        ORDER BY event_type, lag
      """)),

    // SAX symbolization of each event type's hourly series: 8
    // equal-count PAA chunks, 4-letter equal-frequency alphabet — a
    // million-point series becomes an 8-char motif word, with both
    // classic float steps replaced by integer-lattice equivalents
    // (TimeSeries.saxWords scaladoc). Oracle replays the chunk
    // assignment and the per-key ntile with the same tie order.
    QueryDef(
      "q_sax",
      (s, dir) =>
        graft.operators.TimeSeries.saxWords(
            Tables.events(s, dir), "event_type", "ts",
            segments = 8, alphabet = 4)
          .orderBy(col("event_type"), col("segment")),
      Some("""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY h) - 1 AS i,
                 COUNT(*) OVER (PARTITION BY event_type) AS nh
          FROM hourly),
        chunks AS (
          SELECT event_type,
                 CAST((i * 8) // nh AS INTEGER) AS segment,
                 CAST(count(*) AS BIGINT) AS n_hours,
                 CAST(sum(n) AS BIGINT) AS paa_sum
          FROM idx GROUP BY 1, 2)
        SELECT event_type, segment, n_hours, paa_sum,
               chr(CAST(96 + ntile(4) OVER (PARTITION BY event_type
                                            ORDER BY paa_sum, segment)
                        AS INTEGER)) AS symbol
        FROM chunks
        ORDER BY event_type, segment
      """)),

    // Kaplan-Meier + Nelson-Aalen survival curves for signup →
    // purchase conversion with right censoring (users who never
    // purchased leave the risk set at their last event instead of
    // biasing the curve — Survival scaladoc). The oracle replays the
    // risk sets with a reversed running count and the KM product
    // with a recursive CTE in the same ascending step order.
    QueryDef(
      "q_survival",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val t0 = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
        val dur = e.join(t0, "user_id")
          .groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "purchase" &&
            col("us") > col("t0"), col("us"))).as("tp"),
            max(col("us")).as("tmax"), max(col("t0")).as("t00"))
          .select(
            when(col("tp").isNotNull, col("tp") - col("t00"))
              .otherwise(col("tmax") - col("t00")).as("duration"),
            when(col("tp").isNotNull, 1L).otherwise(0L).as("event"))
        graft.operators.Survival.curves(dur, "duration", "event")
          .orderBy(col("t"))
      },
      Some(survivalOracle)),

    // Two-group log-rank test on the SAME signup→purchase durations
    // as q_survival, cohorts by user parity: do the two cohorts
    // convert at the same rate, with censored users counted
    // correctly (they leave the risk set without an event — a naive
    // rate comparison silently drops them). Hypergeometric O−E and
    // variance terms per event time: E on the kruskal div+remnano
    // lattice, each V term one IEEE sequence nano-snapped and
    // integer-summed, z at the micro edge
    // (Survival.logRank scaladoc).
    QueryDef(
      "q_logrank",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val t0 = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
        val dur = e.join(t0, "user_id")
          .groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "purchase" &&
            col("us") > col("t0"), col("us"))).as("tp"),
            max(col("us")).as("tmax"), max(col("t0")).as("t00"))
          .select(col("user_id"),
            when(col("tp").isNotNull, col("tp") - col("t00"))
              .otherwise(col("tmax") - col("t00")).as("duration"),
            when(col("tp").isNotNull, 1L).otherwise(0L).as("event"))
          .withColumn("part", lit("all"))
        graft.operators.Survival.logRank(dur, "part",
          pmod(col("user_id"), lit(2L)) === 1, "duration", "event")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        t0 AS (SELECT user_id, min(us) AS t0 FROM e
               WHERE event_type = 'signup' GROUP BY 1),
        dur AS (
          SELECT user_id % 2 = 1 AS b,
                 CASE WHEN tp IS NOT NULL THEN tp - t00
                      ELSE tmax - t00 END AS t,
                 CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
          FROM (
            SELECT e.user_id,
                   min(CASE WHEN e.event_type = 'purchase'
                            AND e.us > t0.t0 THEN e.us END) AS tp,
                   max(e.us) AS tmax, max(t0.t0) AS t00
            FROM e JOIN t0 USING (user_id)
            GROUP BY 1)),
        pt AS (
          SELECT t,
                 CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb,
                 CAST(SUM(CASE WHEN b THEN ev ELSE 0 END) AS BIGINT)
                   AS db,
                 CAST(SUM(ev) AS BIGINT) AS dall
          FROM dur GROUP BY 1),
        rk AS (
          SELECT *,
                 CAST(SUM(ca) OVER wd AS BIGINT) AS na,
                 CAST(SUM(cb) OVER wd AS BIGINT) AS nb
          FROM pt
          WINDOW wd AS (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)),
        evs AS (
          SELECT dall AS d, na + nb AS n, na, nb, db
          FROM rk WHERE dall > 0),
        tm AS (
          SELECT db,
                 (d * nb) // n AS eq,
                 CAST(ROUND(CAST((d * nb) % n AS DOUBLE)
                      / CAST(n AS DOUBLE) * 1e9) AS BIGINT) AS er,
                 CASE WHEN n >= 2 THEN
                   CAST(ROUND(CAST(d * (n - d) AS DOUBLE)
                        * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) - 1.0)) * 1e9)
                     AS BIGINT)
                 ELSE 0 END AS vn
          FROM evs),
        sz AS (
          SELECT CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
          FROM dur),
        ag AS (
          SELECT CAST(SUM(db) AS BIGINT) AS o_b,
                 CAST(SUM(eq) AS BIGINT) AS eqs,
                 CAST(SUM(er) AS BIGINT) AS ers,
                 CAST(SUM(vn) AS BIGINT) AS v_nano
          FROM tm)
        SELECT 'all' AS part, sz.n_a, sz.n_b, ag.o_b,
               CAST(ag.eqs * 1000000000 + ag.ers AS BIGINT)
                 AS e_b_nano,
               ag.v_nano,
               CAST(ROUND((CAST(ag.o_b AS DOUBLE)
                      - (CAST(ag.eqs AS DOUBLE)
                         + CAST(ag.ers AS DOUBLE) / 1e9))
                    / sqrt(CAST(ag.v_nano AS DOUBLE) / 1e9) * 1e6)
                 AS BIGINT) AS z_micro
        FROM sz, ag
        WHERE sz.n_a > 0 AND sz.n_b > 0 AND ag.v_nano > 0
      """)),

    // Stage-to-stage funnel conversion rates: of the users who
    // reached stage k, what ppm continued to k+1 — the derivative
    // view of q_funnel's histogram (reached(k) = Σ_{s>=k} n_users,
    // all integers, one small rollup over the 5-row stage table).
    QueryDef(
      "q_funnel_rates",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        def firstOf(t: String) =
          min(when(col("event_type") === t, col("us"))).as(s"t_$t")
        val stage = when(col("t_signup").isNull, 0)
          .when(col("t_view").isNull || col("t_view") <= col("t_signup"), 1)
          .when(col("t_click").isNull || col("t_click") <= col("t_view"), 2)
          .when(col("t_purchase").isNull ||
            col("t_purchase") <= col("t_click"), 3)
          .otherwise(4)
        val hist = e.groupBy(col("user_id"))
          .agg(firstOf("signup"), firstOf("view"),
            firstOf("click"), firstOf("purchase"))
          .select(stage.as("stage"))
          .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
        val wGe = Window.orderBy(col("stage").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist
          .withColumn("reached", sum(col("n_users")).over(wGe))
          .withColumn("reached_next",
            lag(col("reached"), 1).over(Window.orderBy(col("stage"))))
          .select(col("stage"), col("n_users"), col("reached"),
            when(col("stage") > 0, expr(
              "(reached * CAST(1000000 AS BIGINT)) div reached_next"))
              .as("conv_from_prev_ppm"))
          .orderBy(col("stage"))
      },
      Some("""
        WITH f AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'signup'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t1,
                 min(CASE WHEN event_type = 'view'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t2,
                 min(CASE WHEN event_type = 'click'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t3,
                 min(CASE WHEN event_type = 'purchase'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t4
          FROM events GROUP BY 1),
        s AS (
          SELECT CASE WHEN t1 IS NULL THEN 0
                      WHEN t2 IS NULL OR t2 <= t1 THEN 1
                      WHEN t3 IS NULL OR t3 <= t2 THEN 2
                      WHEN t4 IS NULL OR t4 <= t3 THEN 3
                      ELSE 4 END AS stage
          FROM f),
        hist AS (
          SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
          FROM s GROUP BY stage),
        roll AS (
          SELECT stage, n_users,
                 CAST(SUM(n_users) OVER (ORDER BY stage DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS reached
          FROM hist)
        SELECT stage, n_users, reached,
               CASE WHEN stage > 0 THEN
                 CAST((reached * 1000000)
                      // lag(reached, 1) OVER (ORDER BY stage)
                   AS BIGINT) END AS conv_from_prev_ppm
        FROM roll
        ORDER BY stage
      """)),

    // Ingestion-coverage gap audit: hours inside each event type's
    // own [first, last] span with ZERO events — the "did the feed go
    // dark" completeness check (expected hours generated from the
    // span, observed anti-joined away; counts only, all integer).
    QueryDef(
      "q_coverage_gaps",
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"),
            window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"),
            unix_timestamp(col("window.start")).as("h"))
        val spans = hourly.groupBy(col("event_type"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"),
            count(lit(1)).as("n_observed"))
        spans
          .select(col("event_type"), col("n_observed"),
            ((col("h1") - col("h0")) / 3600 + 1).cast("long")
              .as("n_expected"))
          .withColumn("n_missing", col("n_expected") - col("n_observed"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type,
                 epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h
          FROM events GROUP BY 1, 2),
        spans AS (
          SELECT event_type, min(h) AS h0, max(h) AS h1,
                 CAST(count(*) AS BIGINT) AS n_observed
          FROM hourly GROUP BY 1)
        SELECT event_type, n_observed,
               CAST((h1 - h0) / 3600 + 1 AS BIGINT) AS n_expected,
               CAST((h1 - h0) / 3600 + 1 - n_observed AS BIGINT)
                 AS n_missing
        FROM spans
        ORDER BY event_type
      """)),

    // Median signup→purchase conversion time under censoring: the
    // first event time where the KM survival curve drops to <= 0.5 —
    // THE "how long does conversion take" number, which a naive
    // median-of-converters understates by ignoring everyone still
    // unconverted. One more selection over the q_survival chain.
    QueryDef(
      "q_median_survival",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val t0 = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
        val dur = e.join(t0, "user_id")
          .groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "purchase" &&
            col("us") > col("t0"), col("us"))).as("tp"),
            max(col("us")).as("tmax"), max(col("t0")).as("t00"))
          .select(
            when(col("tp").isNotNull, col("tp") - col("t00"))
              .otherwise(col("tmax") - col("t00")).as("duration"),
            when(col("tp").isNotNull, 1L).otherwise(0L).as("event"))
        graft.operators.Survival.curves(dur, "duration", "event")
          .filter(col("km") <= 0.5)
          .orderBy(col("t"))
          .limit(1)
          .select(col("t").as("median_t_us"), col("n_risk"),
            col("km"), col("na_cumhaz"))
      },
      Some {
        // wrap the full survival replay: first step at or below 0.5
        s"""WITH survival AS (
          ${survivalOracle.replace("ORDER BY na.t", "")})
        SELECT t AS median_t_us, n_risk, km, na_cumhaz
        FROM survival WHERE km <= 0.5
        ORDER BY t LIMIT 1
      """
      }),

    // Per-user behavioral entropy: Shannon H over the user's
    // event-type distribution — predictability scoring (H near 0 =
    // single-purpose account, high H = diverse journeys), same
    // 9-dp/DECIMAL per-term lattice as q_token_entropy, users with
    // >= 5 events.
    QueryDef(
      "q_session_entropy",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cnts = Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("user_id"))
        val p = col("c").cast("double") / sum(col("c")).over(w)
        cnts
          .select(col("user_id"),
            sum(col("c")).over(w).as("n"),
            round(negate(p) * log10(p), 9)
              .cast(org.apache.spark.sql.types.DecimalType(38, 12))
              .as("h"))
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n_events"),
            round(sum(col("h")).cast("double"), 6).as("entropy"))
          .filter(col("n_events") >= 5)
          .orderBy(col("user_id"))
      },
      Some("""
        WITH cnts AS (
          SELECT user_id, event_type, count(*) AS c
          FROM events GROUP BY 1, 2),
        wn AS (
          SELECT user_id, c,
                 CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS n
          FROM cnts),
        contrib AS (
          SELECT user_id, n,
                 CAST(ROUND(-(CAST(c AS DOUBLE) / n)
                              * log10(CAST(c AS DOUBLE) / n), 9)
                      AS DECIMAL(38,12)) AS h
          FROM wn)
        SELECT user_id, max(n) AS n_events,
               ROUND(CAST(sum(h) AS DOUBLE), 6) AS entropy
        FROM contrib GROUP BY user_id
        HAVING max(n) >= 5
        ORDER BY user_id
      """)),

    // RFM segmentation: per-user Recency/Frequency/Monetary quartile
    // codes — the classic entity-scoring analytic. All three metrics
    // are exact integers (last-touch µs, event count, value-cents
    // sum); quartiles are ntile(4) with (metric, user_id) total
    // orders so the cut replays exactly. The users frame is
    // entity-sized — the quantile-sketch cut is the corpus-scale
    // swap-in for the ntile windows (the q_confidence_bins note).
    QueryDef(
      "q_rfm",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val users = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(max(unix_micros(col("ts"))).as("last_us"),
            count(lit(1)).as("freq"),
            sum(round(col("value") * 100).cast("long")).as("cents"))
        users
          .withColumn("r", ntile(4).over(
            Window.orderBy(col("last_us").desc, col("user_id"))))
          .withColumn("f", ntile(4).over(
            Window.orderBy(col("freq").desc, col("user_id"))))
          .withColumn("m", ntile(4).over(
            Window.orderBy(col("cents").desc, col("user_id"))))
          .select(col("user_id"), col("last_us"), col("freq"),
            col("cents"),
            (col("r") * 100 + col("f") * 10 + col("m")).as("rfm"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH u AS (
          SELECT user_id,
                 max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
                 count(*) AS freq,
                 CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events GROUP BY 1)
        SELECT user_id, last_us, freq, cents,
               ntile(4) OVER (ORDER BY last_us DESC, user_id) * 100
               + ntile(4) OVER (ORDER BY freq DESC, user_id) * 10
               + ntile(4) OVER (ORDER BY cents DESC, user_id) AS rfm
        FROM u
        ORDER BY user_id
      """)),

    // Time-constrained funnel: each stage counts only when its FIRST
    // touch lands within 72 h of the previous stage's — the "did the
    // journey happen as a journey" variant of q_funnel (which admits
    // a purchase months later). Each stage is one conditional min
    // over the user's events after a broadcast join of the previous
    // stage's anchors — funnel depth bounds the pass count.
    QueryDef(
      "q_funnel_steps",
      (s, dir) => {
        val win = 72L * 3600 * 1000000
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        def stage(prev: org.apache.spark.sql.DataFrame, t: String,
            prevCol: String, outCol: String) =
          e.join(prev, "user_id")
            .groupBy(col("user_id"))
            .agg(min(when(col("event_type") === t &&
              col("us") > col(prevCol) &&
              col("us") <= col(prevCol) + win, col("us"))).as(outCol),
              max(col(prevCol)).as(prevCol))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
        val s2 = stage(s1, "view", "t1", "t2")
        val s3 = stage(s2.filter(col("t2").isNotNull)
          .select(col("user_id"), col("t2")), "click", "t2", "t3")
        val s4 = stage(s3.filter(col("t3").isNotNull)
          .select(col("user_id"), col("t3")), "purchase", "t3", "t4")
        val staged = s1
          .join(s2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
          .join(s3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
          .join(s4.select(col("user_id"), col("t4")), Seq("user_id"), "left")
          .select(when(col("t4").isNotNull, 4)
            .when(col("t3").isNotNull, 3)
            .when(col("t2").isNotNull, 2)
            .otherwise(1).as("stage"))
        staged.groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("stage"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        s1 AS (SELECT user_id, min(us) AS t1 FROM e
               WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (
          SELECT e.user_id,
                 min(CASE WHEN e.event_type = 'view' AND e.us > s1.t1
                          AND e.us <= s1.t1 + 259200000000
                          THEN e.us END) AS t2
          FROM e JOIN s1 USING (user_id) GROUP BY 1),
        s3 AS (
          SELECT e.user_id,
                 min(CASE WHEN e.event_type = 'click' AND e.us > s2.t2
                          AND e.us <= s2.t2 + 259200000000
                          THEN e.us END) AS t3
          FROM e JOIN s2 USING (user_id)
          WHERE s2.t2 IS NOT NULL GROUP BY 1),
        s4 AS (
          SELECT e.user_id,
                 min(CASE WHEN e.event_type = 'purchase' AND e.us > s3.t3
                          AND e.us <= s3.t3 + 259200000000
                          THEN e.us END) AS t4
          FROM e JOIN s3 USING (user_id)
          WHERE s3.t3 IS NOT NULL GROUP BY 1),
        staged AS (
          SELECT CASE WHEN s4.t4 IS NOT NULL THEN 4
                      WHEN s3.t3 IS NOT NULL THEN 3
                      WHEN s2.t2 IS NOT NULL THEN 2
                      ELSE 1 END AS stage
          FROM s1
          LEFT JOIN s2 USING (user_id)
          LEFT JOIN s3 USING (user_id)
          LEFT JOIN s4 USING (user_id))
        SELECT stage, COUNT(*) AS n_users FROM staged
        GROUP BY stage ORDER BY stage
      """)),

    // Streaming twin of q_funnel: per-user earliest stage touches as
    // O(1) mapGroupsWithState (min-merge — commutative, so arrival
    // order cannot change the state), stage verdict computed on the
    // final state exactly like the batch aggregate — shares
    // q_funnel's oracle (StreamingOps.funnelState scaladoc).
    QueryDef(
      "q_stream_funnel",
      (s, dir) =>
        StreamingOps.funnelHistogram(s, s"$dir/events.parquet")
          .orderBy(col("stage")),
      Some("""
        WITH f AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'signup'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t1,
                 min(CASE WHEN event_type = 'view'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t2,
                 min(CASE WHEN event_type = 'click'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t3,
                 min(CASE WHEN event_type = 'purchase'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t4
          FROM events GROUP BY 1),
        s AS (
          SELECT CASE WHEN t1 IS NULL THEN 0
                      WHEN t2 IS NULL OR t2 <= t1 THEN 1
                      WHEN t3 IS NULL OR t3 <= t2 THEN 2
                      WHEN t4 IS NULL OR t4 <= t3 THEN 3
                      ELSE 4 END AS stage
          FROM f)
        SELECT stage, COUNT(*) AS n_users FROM s
        GROUP BY stage ORDER BY stage
      """)),

    // Mann-Kendall monotone-trend test on the DAILY value rollup per
    // event_type — the distribution-free drift alarm (is purchase
    // volume trending?) that survives any monotone transform where
    // q_group_regression assumes a line. The rollup keeps n at the
    // calendar's size (30 points here) no matter the corpus scale;
    // S and the tie-corrected variance numerator are exact integers,
    // z snaps to micro (NonParametric.mannKendall scaladoc).
    QueryDef(
      "q_mann_kendall",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
          .select(col("event_type"),
            datediff(col("day"), to_date(lit("2024-01-01")))
              .cast("long").as("di"),
            col("cents"))
        graft.operators.NonParametric.mannKendall(
            daily, "event_type", "di", "cents")
          .orderBy(col("event_type"))
      },
      Some(mannKendallOracle)),

    // Streaming twin of q_mann_kendall: the drift alarm as
    // mapGroupsWithState — state per event_type is the day→cents
    // rollup (CALENDAR-bounded, the batch operator's own scale
    // contract), each trigger re-derives the exact integer (S,
    // var_num) from it, and the z edge is the batch column sequence
    // applied to the emitted integers, so the twin shares the batch
    // oracle bit-for-bit. The (day→cents) merge is commutative, so
    // the result is independent of micro-batch splits
    // (StreamingOps.mannKendallState scaladoc).
    QueryDef(
      "q_stream_mann_kendall",
      (s, dir) =>
        StreamingOps.mannKendallHistory(s, s"$dir/events.parquet")
          .orderBy(col("event_type")),
      Some(mannKendallOracle)),

    // Seasonal Mann-Kendall on the same daily rollup: pairs compare
    // only within the same WEEKDAY, so the weekly rhythm can neither
    // mask nor fake a trend; exact integer S/Var sum across the 7
    // seasons and one continuity-corrected z forms at the edge
    // (NonParametric.seasonalMannKendall scaladoc). Season ids need
    // only GROUP the same dates in both engines — Spark's dayofweek
    // (Sun=1..7) and DuckDB's dow (Sun=0..6) differ as VALUES but
    // induce the identical partition, and the id never reaches the
    // output.
    QueryDef(
      "q_seasonal_mk",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
          .select(col("event_type"),
            dayofweek(col("day")).cast("long").as("season"),
            datediff(col("day"), to_date(lit("2024-01-01")))
              .cast("long").as("di"),
            col("cents"))
        graft.operators.NonParametric.seasonalMannKendall(
            daily, "event_type", "season", "di", "cents")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type,
                 date_part('dow', CAST(ts AS DATE)) AS season,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   AS di,
                 CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events GROUP BY 1, 2, 3),
        p AS (
          SELECT a.event_type, a.season,
                 CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                               WHEN b.cents < a.cents THEN -1
                               ELSE 0 END) AS BIGINT) AS s_stat
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.season = b.season
            AND a.di < b.di
          GROUP BY 1, 2),
        nn AS (SELECT event_type, season, CAST(count(*) AS BIGINT) AS n
               FROM daily GROUP BY 1, 2),
        ties AS (
          SELECT event_type, season,
                 CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
          FROM (SELECT event_type, season, cents, count(*) AS t
                FROM daily GROUP BY 1, 2, 3)
          GROUP BY 1, 2),
        per AS (
          SELECT nn.event_type, nn.n,
                 COALESCE(p.s_stat, 0) AS s_stat,
                 nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie AS var_num
          FROM nn
          LEFT JOIN p ON p.event_type = nn.event_type
            AND p.season = nn.season
          JOIN ties t ON t.event_type = nn.event_type
            AND t.season = nn.season),
        tot AS (
          SELECT event_type, CAST(SUM(n) AS BIGINT) AS n,
                 CAST(SUM(s_stat) AS BIGINT) AS s_stat,
                 CAST(SUM(var_num) AS BIGINT) AS var_num
          FROM per GROUP BY 1)
        SELECT event_type, n, s_stat, var_num,
               CAST(ROUND((CASE WHEN s_stat > 0
                                THEN CAST(s_stat - 1 AS DOUBLE)
                                WHEN s_stat < 0
                                THEN CAST(s_stat + 1 AS DOUBLE)
                                ELSE 0.0 END
                           / sqrt(CAST(var_num AS DOUBLE) / 18.0))
                          * 1000000.0) AS BIGINT) AS z_micro
        FROM tot
        WHERE var_num > 0
        ORDER BY event_type
      """)),

    // Wald SPRT per event type: continuous "did the value>50 rate
    // move from 30% toward 40%" monitoring with early stopping —
    // boundaries keep their alpha/beta guarantees at ANY evaluation
    // cadence (the optional-stopping property q_ab_test's
    // fixed-horizon verdict lacks). The per-observation log terms
    // and boundaries snap once to the log10 micro lattice at plan
    // build, so the LLR is an exact integer linear form in (n,
    // successes) and the oracle replays it with the same pinned
    // constants (AbTest.sprt scaladoc).
    QueryDef(
      "q_sprt",
      (s, dir) =>
        graft.operators.AbTest.sprt(
            Tables.events(s, dir), "event_type",
            col("value") > 50, p0 = 0.30, p1 = 0.40)
          .orderBy(col("event_type")),
      Some(sprtOracle)),

    // Mixture SPRT per event type — always-valid inference for the
    // CONTINUOUS metric (integer cents) where q_sprt monitors a
    // rate: the normal-mixture likelihood ratio keeps α at any
    // peeking cadence (Johari et al. 2017). Exact per-cohort
    // (n, Σx, Σx²) integers, n·Σx² − (Σx)² exact in DECIMAL, τ² as
    // the exact rational tauMicro²/10¹², one IEEE sequence for
    // log₁₀Λ, and an integer-threshold decision
    // (AbTest.msprt scaladoc). τ = 10 cents, α = 5%.
    QueryDef(
      "q_msprt",
      (s, dir) =>
        graft.operators.AbTest.msprt(
            Tables.events(s, dir)
              .select(col("event_type"), col("user_id"),
                round(col("value") * 100).cast("long").as("cents")),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1, "cents",
            tauMicro = 10000000L)
          .orderBy(col("event_type")),
      Some(msprtOracle)),

    // Streaming twin of q_msprt — always-valid by construction, so
    // a per-micro-batch readout is statistically sound; state is the
    // O(1) per-cohort sufficient statistics (a pure commutative
    // integer fold) and the decision edge is the batch operator's
    // own msprtDecision, so the twin shares q_msprt's oracle
    // (StreamingOps.msprtState scaladoc).
    QueryDef(
      "q_stream_msprt",
      (s, dir) =>
        graft.streaming.StreamingOps.msprtHistory(
            s, s"$dir/events.parquet", tauMicro = 10000000L)
          .orderBy(col("event_type")),
      Some(msprtOracle)),

    // Streaming twin of q_sprt — the test that EXISTS for this
    // mode: Wald's boundaries hold at any evaluation cadence, so a
    // per-micro-batch decision is statistically sound. State is the
    // O(1) (n, successes) sufficient statistics; the decision edge
    // is the batch operator's own pinned-lattice sprtDecision, so
    // the twin shares q_sprt's oracle; counting is commutative, so
    // batch splits can't change the result
    // (StreamingOps.sprtState scaladoc).
    QueryDef(
      "q_stream_sprt",
      (s, dir) =>
        StreamingOps.sprtHistory(s, s"$dir/events.parquet",
            p0 = 0.30, p1 = 0.40)
          .orderBy(col("event_type")),
      Some(sprtOracle)),

    // CUPED variance-reduced A/B readout per event type: X = each
    // user's first-half-of-January cents, Y = second-half cents
    // (users active in both halves), cohort = user parity. theta
    // and rho-squared from exact DECIMAL sufficient statistics, the
    // adjusted lift as one IEEE sequence, everything micro-snapped
    // (AbTest.cuped scaladoc) — the sensitivity-boost table an
    // experimentation platform prints beside the raw lift.
    QueryDef(
      "q_cuped",
      (s, dir) => {
        import graft.operators.AbTest
        val perUser = Tables.events(s, dir)
          .select(col("event_type"), col("user_id"),
            (dayofmonth(col("ts")) <= 15).as("pre"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
            sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"),
            max(when(col("pre"), 1L).otherwise(0L)).as("hp"),
            max(when(!col("pre"), 1L).otherwise(0L)).as("hq"))
          .filter(col("hp") === 1L && col("hq") === 1L)
        AbTest.cuped(perUser, "event_type",
            pmod(col("user_id"), lit(2L)) === 1, "x", "y")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, user_id,
                 date_part('day', CAST(ts AS TIMESTAMP)) <= 15 AS pre,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events),
        u AS (
          SELECT event_type, user_id,
                 CAST(SUM(CASE WHEN pre THEN cents ELSE 0 END)
                   AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN NOT pre THEN cents ELSE 0 END)
                   AS BIGINT) AS y,
                 MAX(CASE WHEN pre THEN 1 ELSE 0 END) AS hp,
                 MAX(CASE WHEN NOT pre THEN 1 ELSE 0 END) AS hq
          FROM e GROUP BY 1, 2),
        v AS (SELECT event_type, user_id % 2 = 1 AS b, x, y
              FROM u WHERE hp = 1 AND hq = 1),
        agg AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                   AS sxy,
                 SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                   AS sxx,
                 SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                   AS syy,
                 CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
                 CAST(SUM(CASE WHEN NOT b THEN x ELSE 0 END) AS BIGINT)
                   AS sxa,
                 CAST(SUM(CASE WHEN b THEN x ELSE 0 END) AS BIGINT)
                   AS sxb,
                 CAST(SUM(CASE WHEN NOT b THEN y ELSE 0 END) AS BIGINT)
                   AS sya,
                 CAST(SUM(CASE WHEN b THEN y ELSE 0 END) AS BIGINT)
                   AS syb
          FROM v GROUP BY 1),
        c AS (
          SELECT event_type, n, n_a, n_b, sxa, sxb, sya, syb,
                 CAST(n AS DECIMAL(38,0)) * sxy
                   - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))
                   AS covn,
                 CAST(n AS DECIMAL(38,0)) * sxx
                   - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
                   AS vxn,
                 CAST(n AS DECIMAL(38,0)) * syy
                   - CAST(sy AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))
                   AS vyn
          FROM agg WHERE n_a > 0 AND n_b > 0)
        SELECT event_type, n, n_a, n_b,
               CAST(ROUND(CAST(covn AS DOUBLE) / CAST(vxn AS DOUBLE)
                          * 1e6) AS BIGINT) AS theta_micro,
               CAST(ROUND((CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE)
                           - CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE))
                          * 1e6) AS BIGINT) AS raw_diff_micro,
               CAST(ROUND((CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE)
                           - CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE)
                           - CAST(covn AS DOUBLE) / CAST(vxn AS DOUBLE)
                             * (CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE)
                                - CAST(sxa AS DOUBLE)
                                  / CAST(n_a AS DOUBLE)))
                          * 1e6) AS BIGINT) AS adj_diff_micro,
               CAST(ROUND(CAST(covn AS DOUBLE) * CAST(covn AS DOUBLE)
                          / (CAST(vxn AS DOUBLE) * CAST(vyn AS DOUBLE))
                          * 1e6) AS BIGINT) AS rho2_ppm
        FROM c
        WHERE vxn > 0 AND vyn > 0
        ORDER BY event_type
      """)),

    // Two-sample Kuiper test on the SAME cohort split as q_ks_test:
    // V = D⁺ + D⁻ adds the largest ECDF gaps in BOTH directions, so
    // a median-preserving variance shift (where the ECDFs cross and
    // KS goes half-blind) still registers, and the statistic is
    // rotation-invariant for cyclic metrics. Same integer merged-
    // order lattice as KS; verdict by (D⁺+D⁻)²·10⁴ >
    // 30520·n_a·n_b·(n_a+n_b) (c = 1.747 at 95%;
    // DistributionTests.kuiperTwoSample scaladoc).
    QueryDef(
      "q_kuiper",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.kuiperTwoSample(
            Tables.events(s, dir),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "value", "event_id")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_type,
                 CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS b,
                 value, event_id
          FROM events),
        m AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END)
                      OVER wr AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END)
                      OVER wr AS BIGINT) AS cb,
                 CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END)
                      OVER wg AS BIGINT) AS na,
                 CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END)
                      OVER wg AS BIGINT) AS nb
          FROM e
          WINDOW wr AS (PARTITION BY event_type
                        ORDER BY value, event_id
                        ROWS UNBOUNDED PRECEDING),
                 wg AS (PARTITION BY event_type)),
        a AS (
          SELECT event_type, max(na) AS n_a, max(nb) AS n_b,
                 max(ca * nb - cb * na) AS dpos,
                 max(cb * na - ca * nb) AS dneg
          FROM m GROUP BY 1)
        SELECT event_type, n_a, n_b,
               ROUND(CAST(dpos + dneg AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
                 AS kuiper_v,
               CASE WHEN CAST(dpos + dneg AS HUGEINT) * (dpos + dneg)
                         * 10000
                       > CAST(30520 AS HUGEINT) * n_a * n_b
                         * (n_a + n_b)
                    THEN 'shifted' ELSE 'same' END AS verdict
        FROM a
        ORDER BY event_type
      """)),

    // k-sample Anderson-Darling (Scholz-Stephens A²akN, midrank tie
    // version) across THREE user-cohort samples per event type, on
    // integer cents: the tail-weighted "did ANY source drift?" test
    // that fires on tail-only contamination KS and CvM dilute. The
    // doubled-midrank lattice clears every half into exact integers;
    // per-cell terms are one IEEE sequence 9-dp-snapped and
    // DECIMAL-summed (DistributionTests.andersonDarlingK scaladoc).
    QueryDef(
      "q_ad_test",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.andersonDarlingK(
            Tables.events(s, dir)
              .select(col("event_type"),
                pmod(col("user_id"), lit(3L)).as("cohort"),
                round(col("value") * 100).cast("long").as("cents")),
            "event_type", "cohort", "cents")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_type AS g, user_id % 3 AS s,
                 CAST(ROUND(value * 100) AS BIGINT) AS x
          FROM events),
        pooled AS (SELECT g, x, count(*) AS l FROM e GROUP BY 1, 2),
        pc AS (
          SELECT g, x, l,
                 SUM(l) OVER (PARTITION BY g ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS c
          FROM pooled),
        bb AS (SELECT g, x, l, 2 * c - l AS b2 FROM pc),
        sizes AS (SELECT g, s, count(*) AS ni FROM e GROUP BY 1, 2),
        cells AS (SELECT g, s, x, count(*) AS lij FROM e GROUP BY 1, 2, 3),
        grid AS (
          SELECT bb.g, sz.s, bb.x, bb.l, bb.b2, sz.ni,
                 COALESCE(c.lij, 0) AS lij
          FROM bb JOIN sizes sz ON sz.g = bb.g
          LEFT JOIN cells c ON c.g = bb.g AND c.s = sz.s AND c.x = bb.x),
        gc AS (
          SELECT g, s, x, l, b2, ni, lij,
                 SUM(lij) OVER (PARTITION BY g, s ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS cij
          FROM grid),
        mm AS (SELECT g, s, x, l, b2, ni, 2 * cij - lij AS m2 FROM gc),
        tot AS (SELECT g, count(*) AS n, count(DISTINCT s) AS k
                FROM e GROUP BY 1),
        terms AS (
          SELECT mm.g, t.n, t.k,
                 ROUND(
                   (CAST(CAST(t.n AS HUGEINT) * m2
                         - CAST(ni AS HUGEINT) * b2 AS DOUBLE)
                    * CAST(CAST(t.n AS HUGEINT) * m2
                           - CAST(ni AS HUGEINT) * b2 AS DOUBLE))
                   / CAST(CAST(b2 AS HUGEINT) * (2 * t.n - b2)
                          - CAST(t.n AS HUGEINT) * l AS DOUBLE)
                   / CAST(ni AS DOUBLE) * CAST(l AS DOUBLE), 9) AS term
          FROM mm JOIN tot t ON t.g = mm.g
          WHERE t.k >= 2
            AND CAST(b2 AS HUGEINT) * (2 * t.n - b2)
                - CAST(t.n AS HUGEINT) * l > 0),
        agg AS (
          SELECT g, n, k, SUM(CAST(term AS DECIMAL(38,12))) AS terms
          FROM terms GROUP BY 1, 2, 3)
        SELECT g AS event_type, n, k,
               CAST(ROUND(CAST(n - 1 AS DOUBLE) * CAST(terms AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                 * 1e6) AS BIGINT) AS a2_micro
        FROM agg
        ORDER BY event_type
      """)),

    // G-test of independence (log-likelihood χ²) between event type
    // and a three-way user cohort: the additive independence
    // statistic (G over a merged table = Σ component G's + the
    // between-table G), so per-shard G's roll up exactly — the right
    // drill-down companion to q_cramers_v. Per-cell O·ln(O·N/(R·C))
    // is one IEEE sequence 9-dp-snapped and DECIMAL-summed; verdict
    // at the exact DECIMAL edge vs χ²(df=8, 95%) = 15.5073
    // (DistributionTests.gTest scaladoc).
    QueryDef(
      "q_gtest",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.gTest(
            Tables.events(s, dir)
              .select(col("event_type"),
                pmod(col("user_id"), lit(3L)).as("cohort")),
            "event_type", "cohort", crit4 = 155073L)
      },
      Some(gtestOracle)),

    // Ljung-Box whiteness test on each event type's daily-count
    // series (the q_acf series), lags 1..3: is there ANY
    // autocorrelation, as one χ²(3) statistic — the i.i.d. sanity
    // check to run before trusting a drift test on a monitoring
    // counter. r_ℓ rides the exact n²-scaled ACF lattice widened to
    // DECIMAL; per-lag r²/(n−ℓ) terms 9-dp-snapped and
    // DECIMAL-summed; verdict vs χ²(3, 95%) = 7.8147
    // (ChangePoint.ljungBox scaladoc).
    QueryDef(
      "q_ljung_box",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("day"))))
        graft.operators.ChangePoint.ljungBox(
            daily, "event_type", "i", "x", maxLag = 3, crit4 = 78147L)
          .orderBy(col("event_type"))
      },
      Some("""
        WITH series AS (
          SELECT event_type,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, CAST(x AS BIGINT) AS x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) AS i
          FROM series),
        tot AS (
          SELECT event_type, COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx
          FROM idx GROUP BY 1),
        lags AS (SELECT unnest([1, 2, 3]) AS lag),
        pairs AS (
          SELECT h.event_type, l.lag, h.x AS xh, t.x AS xt
          FROM idx h
          CROSS JOIN lags l
          JOIN idx t ON t.event_type = h.event_type
                    AND t.i = h.i + l.lag),
        perlag AS (
          SELECT event_type, lag,
                 SUM(CAST(xh AS HUGEINT) * xt) AS sxy,
                 CAST(SUM(xh) AS BIGINT) AS sh,
                 CAST(SUM(xt) AS BIGINT) AS st
          FROM pairs GROUP BY 1, 2),
        nd AS (
          SELECT p.event_type, t.n, p.lag,
                 CAST(t.n AS HUGEINT) * t.n * p.sxy
                   - CAST(t.n AS HUGEINT) * t.sx * (p.sh + p.st)
                   + CAST(t.n - p.lag AS HUGEINT) * t.sx * t.sx AS num,
                 CAST(t.n AS HUGEINT) * t.n * t.sxx
                   - CAST(t.n AS HUGEINT) * t.sx * t.sx AS den
          FROM perlag p JOIN tot t USING (event_type)
          WHERE t.n > 4
            AND CAST(t.n AS HUGEINT) * t.sxx
                <> CAST(t.sx AS HUGEINT) * t.sx),
        terms AS (
          SELECT event_type, n,
                 ROUND((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                       * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                       / CAST(n - lag AS DOUBLE), 9) AS term
          FROM nd),
        agg AS (
          SELECT event_type, n,
                 SUM(CAST(term AS DECIMAL(38,12))) AS terms
          FROM terms GROUP BY 1, 2)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(3 AS BIGINT) AS h,
               ROUND(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
                     * CAST(terms AS DOUBLE), 6) AS q_stat,
               CASE WHEN ROUND(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
                               * CAST(terms AS DOUBLE), 6)
                       > CAST(78147 AS DOUBLE) / 10000.0
                    THEN 'autocorrelated' ELSE 'white' END AS verdict
        FROM agg
        ORDER BY event_type
      """)),

    // Dickey-Fuller unit-root test on the SAME daily series: is the
    // counter mean-reverting or a random walk? — the stationarity
    // pre-check that tells the dashboard whether a trend alarm
    // (q_mann_kendall) is even meaningful on this feed. Exact
    // n-scaled centered sums to one IEEE t-ratio; verdict at the
    // pinned Fuller 5% constant −2.86
    // (ChangePoint.dickeyFuller scaladoc).
    QueryDef(
      "q_dickey_fuller",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("day"))))
        graft.operators.ChangePoint.dickeyFuller(
            daily, "event_type", "i", "x")
          .orderBy(col("event_type"))
      },
      Some(dickeyFullerOracle)),

    // ADF(1) on the SAME daily series: the augmented form whose
    // Δx_{t−1} regressor absorbs AR(2) serial correlation in the
    // differences — the robustness upgrade over q_dickey_fuller when
    // the counter's day-over-day changes are themselves
    // autocorrelated (q_ljung_box tells you when that is the case).
    // Two-regressor Cramer solve on exact DECIMAL sufficient sums,
    // one mirrored IEEE sequence to the micro edge, verdict at the
    // pinned Fuller 5% constant −2.86 (ChangePoint.adfLag1 scaladoc;
    // AdfSpec carries the brute-force normal-equations cross-check).
    QueryDef(
      "q_adf",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("day"))))
        graft.operators.ChangePoint.adfLag1(
            daily, "event_type", "i", "x")
          .orderBy(col("event_type"))
      },
      Some(adfOracle)),

    // Streaming twin of q_adf: the same calendar day→count rollup
    // state as q_stream_dickey_fuller; every trigger re-derives the
    // exact TEN triple-regression sums by one sorted walk, combined
    // by the batch adfFromSums with all refusals intact. Shares
    // q_adf's oracle (StreamingOps.adfHistory scaladoc).
    QueryDef(
      "q_stream_adf",
      (s, dir) =>
        graft.streaming.StreamingOps.adfHistory(
            s, s"$dir/events.parquet")
          .orderBy(col("event_type")),
      Some(adfOracle)),

    // Stuart-Maxwell marginal homogeneity over THREE paired
    // categories: per user, the FIRST-touch vs LAST-touch event type
    // among {click, purchase, view} — "do user journeys end on the
    // same channel mix they start on?", the k=3 McNemar that the 2×2
    // q_mcnemar cannot express. Exact integer 3×3 pair table, closed
    // 2×2 covariance inverse, verdict by integer cross-multiplication
    // vs χ²(2, 95%) (DistributionTests.stuartMaxwell3 scaladoc).
    QueryDef(
      "q_stuart_maxwell",
      (s, dir) => {
        import graft.operators.DistributionTests
        val e = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "purchase", "view"))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val paired = e.groupBy(col("user_id"))
          .agg(min(struct(col("us"), col("event_id"),
            col("event_type"))).as("f"),
            max(struct(col("us"), col("event_id"),
              col("event_type"))).as("l"))
          .select(lit("all").as("grp"),
            col("f.event_type").as("first_t"),
            col("l.event_type").as("last_t"))
        DistributionTests.stuartMaxwell3(
          paired, "grp", "first_t", "last_t", crit4 = 59915L)
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
          FROM events
          WHERE event_type IN ('click', 'purchase', 'view')),
        fl AS (
          -- (us, event_id) lexicographic == us*1e9 + event_id as one
          -- sortable key (event_id is unique and < 1e9 by fixture
          -- contract); this DuckDB's arg_min has no struct overload
          SELECT user_id,
                 arg_min(event_type,
                   CAST(us AS HUGEINT) * 1000000000 + event_id) AS f,
                 arg_max(event_type,
                   CAST(us AS HUGEINT) * 1000000000 + event_id) AS l
          FROM e GROUP BY 1),
        cells AS (
          SELECT 'all' AS grp, f, l, CAST(count(*) AS BIGINT) AS c
          FROM fl GROUP BY 1, 2, 3),
        cats AS (
          SELECT DISTINCT grp, cat FROM (
            SELECT grp, f AS cat FROM cells
            UNION ALL SELECT grp, l FROM cells)),
        rk AS (
          SELECT grp, cat,
                 ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cat)
                   AS rk
          FROM cats),
        rc AS (
          SELECT c.grp, ra.rk AS ra, rb.rk AS rb, c.c
          FROM cells c
          JOIN rk ra ON ra.grp = c.grp AND ra.cat = c.f
          JOIN rk rb ON rb.grp = c.grp AND rb.cat = c.l),
        a AS (
          SELECT grp, CAST(SUM(c) AS BIGINT) AS n,
                 MAX(GREATEST(ra, rb)) AS k,
                 CAST(SUM(CASE WHEN ra = 1 THEN c ELSE 0 END)
                   AS BIGINT) AS r1,
                 CAST(SUM(CASE WHEN ra = 2 THEN c ELSE 0 END)
                   AS BIGINT) AS r2,
                 CAST(SUM(CASE WHEN rb = 1 THEN c ELSE 0 END)
                   AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN rb = 2 THEN c ELSE 0 END)
                   AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN ra = 1 AND rb = 1 THEN c
                   ELSE 0 END) AS BIGINT) AS n11,
                 CAST(SUM(CASE WHEN ra = 2 AND rb = 2 THEN c
                   ELSE 0 END) AS BIGINT) AS n22,
                 CAST(SUM(CASE WHEN ra = 1 AND rb = 2 THEN c
                   ELSE 0 END) AS BIGINT) AS n12,
                 CAST(SUM(CASE WHEN ra = 2 AND rb = 1 THEN c
                   ELSE 0 END) AS BIGINT) AS n21
          FROM rc GROUP BY 1),
        m AS (
          SELECT grp, n, k,
                 CAST(r2 + c2 - 2 * n22 AS HUGEINT)
                   * (r1 - c1) * (r1 - c1)
                 - 2 * CAST(-(n12 + n21) AS HUGEINT)
                   * (r1 - c1) * (r2 - c2)
                 + CAST(r1 + c1 - 2 * n11 AS HUGEINT)
                   * (r2 - c2) * (r2 - c2) AS num,
                 CAST(r1 + c1 - 2 * n11 AS HUGEINT)
                   * (r2 + c2 - 2 * n22)
                 - CAST(-(n12 + n21) AS HUGEINT) * (-(n12 + n21))
                   AS den
          FROM a)
        SELECT grp, n,
               CAST(ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                 * 1e6) AS BIGINT) AS chi2_micro,
               CASE WHEN num * 10000 > 59915 * den
                    THEN 'shifted' ELSE 'stable' END AS verdict
        FROM m
        WHERE k = 3 AND den > 0
      """)),

    // Lag-1 Granger causality between every ordered pair of event
    // types' daily series: does yesterday's CLICK volume help
    // predict today's PURCHASE volume beyond purchases' own history?
    // — the cross-series lead-lag screen for wiring alert
    // dependencies. Exact DECIMAL sufficient sums, Cramer's-rule
    // two-regressor solve and F in one mirrored IEEE sequence; the
    // F(1, n−3) critical value depends on n, so the statistic is
    // reported raw (the q_cvm_test convention)
    // (ChangePoint.grangerLag1 scaladoc).
    QueryDef(
      "q_granger",
      (s, dir) => {
        // the index is the SHARED epoch-day number, not a per-series
        // row_number: a series missing a calendar day must break its
        // lag pair there, not silently shift against the other series
        // (grangerLag1's idxCol contract)
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", datediff(col("day"), lit("1970-01-01")))
        graft.operators.ChangePoint.grangerLag1(
            daily, "event_type", "i", "x")
          .orderBy(col("cause"), col("effect"))
      },
      Some("""
        WITH series AS (
          SELECT event_type,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, CAST(x AS BIGINT) AS x,
                 CAST(day - DATE '1970-01-01' AS BIGINT) AS i
          FROM series),
        lagd AS (
          SELECT event_type AS s2, i, x AS y,
                 LAG(x) OVER (PARTITION BY event_type ORDER BY i) AS p,
                 LAG(i) OVER (PARTITION BY event_type ORDER BY i) AS pi
          FROM idx),
        base AS (SELECT * FROM lagd WHERE pi = i - 1),
        pr AS (
          SELECT c.event_type AS cause, e.s2 AS effect, e.y, e.p,
                 c.x AS q
          FROM base e JOIN idx c ON c.i = e.i - 1
                                AND c.event_type <> e.s2),
        a AS (
          SELECT cause, effect, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(p) AS BIGINT) AS sp,
                 CAST(SUM(q) AS BIGINT) AS sq,
                 SUM(CAST(y AS HUGEINT) * p) AS syp0,
                 SUM(CAST(y AS HUGEINT) * q) AS syq0,
                 SUM(CAST(p AS HUGEINT) * q) AS spq0,
                 SUM(CAST(p AS HUGEINT) * p) AS spp0,
                 SUM(CAST(q AS HUGEINT) * q) AS sqq0,
                 SUM(CAST(y AS HUGEINT) * y) AS syy0
          FROM pr GROUP BY 1, 2),
        ctr AS (
          SELECT cause, effect, n,
                 CAST(n AS HUGEINT) * spp0
                   - CAST(sp AS HUGEINT) * sp AS spp,
                 CAST(n AS HUGEINT) * sqq0
                   - CAST(sq AS HUGEINT) * sq AS sqq,
                 CAST(n AS HUGEINT) * spq0
                   - CAST(sp AS HUGEINT) * sq AS spq,
                 CAST(n AS HUGEINT) * syp0
                   - CAST(sy AS HUGEINT) * sp AS syp,
                 CAST(n AS HUGEINT) * syq0
                   - CAST(sy AS HUGEINT) * sq AS syq,
                 CAST(n AS HUGEINT) * syy0
                   - CAST(sy AS HUGEINT) * sy AS syy
          FROM a),
        sol AS (
          SELECT cause, effect, n, spp, sqq, spq, syp, syq, syy,
                 CAST(spp AS DOUBLE) * CAST(sqq AS DOUBLE)
                   - CAST(spq AS DOUBLE) * CAST(spq AS DOUBLE) AS det
          FROM ctr
          WHERE n >= 5 AND spp > 0 AND spp * sqq <> spq * spq),
        bc AS (
          SELECT *, (CAST(syp AS DOUBLE) * CAST(sqq AS DOUBLE)
                     - CAST(syq AS DOUBLE) * CAST(spq AS DOUBLE)) / det
                   AS b,
                 (CAST(syq AS DOUBLE) * CAST(spp AS DOUBLE)
                  - CAST(syp AS DOUBLE) * CAST(spq AS DOUBLE)) / det
                   AS c
          FROM sol),
        rs AS (
          SELECT *, CAST(syy AS DOUBLE)
                   - CAST(syp AS DOUBLE) * CAST(syp AS DOUBLE)
                     / CAST(spp AS DOUBLE) AS rssr,
                 CAST(syy AS DOUBLE) - b * CAST(syp AS DOUBLE)
                   - c * CAST(syq AS DOUBLE) AS rssu
          FROM bc)
        SELECT cause, effect, n,
               CAST(ROUND((rssr - rssu)
                 / (rssu / (CAST(n AS DOUBLE) - 3.0)) * 1e6) AS BIGINT)
                 AS f_micro
        FROM rs
        WHERE rssu > 0.0
        ORDER BY cause, effect
      """)),

    // Durbin-Watson / von Neumann ratio on the SAME daily series:
    // the lag-1 serial-correlation check as a fully EXACT rational —
    // first-differencing cancels the mean, so both numerator and
    // denominator are integers and the 1.0/3.0 verdict bands are
    // exact integer cross-multiplications
    // (ChangePoint.durbinWatson scaladoc).
    QueryDef(
      "q_durbin_watson",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("day"))))
        graft.operators.ChangePoint.durbinWatson(
            daily, "event_type", "i", "x")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH series AS (
          SELECT event_type,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, CAST(x AS BIGINT) AS x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) AS i
          FROM series),
        lagged AS (
          SELECT event_type, x,
                 x - LAG(x) OVER (PARTITION BY event_type ORDER BY i)
                   AS d
          FROM idx),
        agg AS (
          SELECT event_type, COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(d AS HUGEINT) * d) AS sdd
          FROM lagged GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               ROUND(CAST(CAST(n AS HUGEINT) * sdd AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * sxx
                            - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6)
                 AS dw,
               CASE
                 WHEN CAST(n AS HUGEINT) * sdd
                      < CAST(n AS HUGEINT) * sxx
                        - CAST(sx AS HUGEINT) * sx THEN 'positive'
                 WHEN CAST(n AS HUGEINT) * sdd
                      > 3 * (CAST(n AS HUGEINT) * sxx
                             - CAST(sx AS HUGEINT) * sx) THEN 'negative'
                 ELSE 'none' END AS verdict
        FROM agg
        WHERE n >= 2
          AND CAST(n AS HUGEINT) * sxx <> CAST(sx AS HUGEINT) * sx
        ORDER BY event_type
      """)),

    // Cochran-Mantel-Haenszel: does the odd-user cohort convert
    // (value ≥ 100) differently AFTER controlling for event type?
    // The stratified companion to q_ab_test — a pooled 2×2 can point
    // the wrong way when strata differ in both mix and base rate
    // (Simpson's paradox); CMH sums each stratum's hypergeometric
    // O−E and variance on the logRank div+remnano lattice
    // (AbTest.cmh scaladoc). Verdict vs χ²(1, 95%) as an integer
    // comparison at the micro edge.
    QueryDef(
      "q_cmh",
      (s, dir) => {
        import graft.operators.AbTest
        AbTest.cmh(
          Tables.events(s, dir),
          "event_type",
          pmod(col("user_id"), lit(2L)) === 1,
          col("value") >= 100.0,
          crit4 = 38415L)
      },
      Some(cmhOracle)),

    // Standardized mean difference (covariate balance) between the
    // q_ks_test cohorts on integer cents, per event type: the check
    // every A/B readout should run FIRST — a significant q_welch_t
    // on the outcome means nothing if the cohorts already differed
    // pre-treatment; |SMD| < 0.1 is the conventional balanced band,
    // compared on the snapped micro integer
    // (AbTest.smdBalance scaladoc).
    QueryDef(
      "q_smd_balance",
      (s, dir) => {
        import graft.operators.AbTest
        AbTest.smdBalance(
            Tables.events(s, dir)
              .select(col("event_type"), col("user_id"),
                round(col("value") * 100).cast("long").as("cents")),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "cents")
          .orderBy(col("event_type"))
      },
      Some(smdOracle)),

    // Jensen-Shannon divergence on the SAME 10-dollar bins and
    // cohort split as q_psi: the BOUNDED ([0, ln 2]), symmetric
    // drift number — PSI blows up on near-empty bins and KL is
    // unbounded, so JS is the cross-metric dashboard default. Same
    // Laplace-smoothed share lattice, per-bin IEEE terms
    // nano-snapped and integer-summed
    // (DistributionTests.jsDivergence scaladoc).
    QueryDef(
      "q_js_divergence",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.jsDivergence(
            Tables.events(s, dir)
              .select(col("event_type"), col("user_id"),
                expr("CAST(ROUND(value * 100) AS BIGINT) div 1000")
                  .as("bin")),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "bin")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, user_id % 2 = 1 AS b,
                 CAST(ROUND(value * 100) AS BIGINT) // 1000 AS bin
          FROM events),
        pb AS (
          SELECT event_type, bin,
                 CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
          FROM e GROUP BY 1, 2),
        mk AS (
          SELECT *, SUM(ca) OVER w AS na, SUM(cb) OVER w AS nb,
                 COUNT(*) OVER w AS nbins
          FROM pb WINDOW w AS (PARTITION BY event_type)),
        p1 AS (
          SELECT event_type, na, nb, nbins,
                 (CAST(ca AS DOUBLE) + 1.0)
                   / (CAST(na AS DOUBLE) + CAST(nbins AS DOUBLE)) AS pa,
                 (CAST(cb AS DOUBLE) + 1.0)
                   / (CAST(nb AS DOUBLE) + CAST(nbins AS DOUBLE)) AS pb2
          FROM mk),
        t AS (
          SELECT event_type, na, nb, nbins,
                 CAST(ROUND((0.5 * pa * ln(pa / ((pa + pb2) / 2.0))
                   + 0.5 * pb2 * ln(pb2 / ((pa + pb2) / 2.0))) * 1e9)
                   AS BIGINT) AS tn
          FROM p1),
        a AS (
          SELECT event_type, CAST(MAX(na) AS BIGINT) AS n_a,
                 CAST(MAX(nb) AS BIGINT) AS n_b,
                 CAST(MAX(nbins) AS BIGINT) AS n_bins,
                 CAST(SUM(tn) AS BIGINT) AS tsum
          FROM t GROUP BY 1)
        SELECT event_type, n_a, n_b, n_bins,
               CAST(ROUND(CAST(tsum AS DOUBLE) / 1e9 * 1e6) AS BIGINT)
                 AS js_micro
        FROM a WHERE n_a > 0 AND n_b > 0
        ORDER BY event_type
      """)),

    // Index-of-dispersion test on each event type's daily counts:
    // is the volume counter Poisson, or bursty? — the modeling
    // pre-check before trusting rate-based anomaly bands
    // (q_event_anomaly assumes near-Poisson noise). D = (n·Σx²−S²)/S
    // is fully exact; the 95% verdict is an integer
    // cross-multiplication with the deviation sign choosing
    // over/under (DistributionTests.dispersionIndex scaladoc).
    QueryDef(
      "q_dispersion",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("x"))
        graft.operators.DistributionTests.dispersionIndex(
            daily, "event_type", "x")
          .orderBy(col("event_type"))
      },
      Some(dispersionOracle)),

    // Two-sample 1-Wasserstein distance on the SAME cohort split as
    // q_ks_test, in integer cents: the drift METRIC beside the
    // verdicts — "by how many cents did the distribution move", the
    // area between the ECDFs, comparable across time and
    // SLO-thresholdable. Exact integers (counts × value gaps,
    // DECIMAL-summed) to one micro-edge division
    // (DistributionTests.wasserstein scaladoc).
    QueryDef(
      "q_wasserstein",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.wasserstein(
            Tables.events(s, dir)
              .select(col("event_type"), col("user_id"),
                round(col("value") * 100).cast("long").as("cents")),
            "event_type",
            pmod(col("user_id"), lit(2L)) === 1,
            "cents")
          .orderBy(col("event_type"))
      },
      Some(wassersteinOracle)),

    // Bartlett's variance-homogeneity test across THREE user-cohort
    // samples per event type: the parametric "did the SPREAD change
    // in any source?" — sharper than q_brown_forsythe when the data
    // are near-normal, read beside the rank scale tests
    // (q_ansari_bradley / q_mood_median). Exact per-sample
    // (n, Σx, Σx²); three IEEE contributions per sample 9-dp-snapped
    // and DECIMAL-summed; verdict vs χ²(2, 95%) = 5.9915
    // (DistributionTests.bartlett scaladoc).
    QueryDef(
      "q_bartlett",
      (s, dir) => {
        import graft.operators.DistributionTests
        DistributionTests.bartlett(
            Tables.events(s, dir)
              .select(col("event_type"),
                pmod(col("user_id"), lit(3L)).as("cohort"),
                round(col("value") * 100).cast("long").as("cents")),
            "event_type", "cohort", "cents", crit4 = 59915L)
          .orderBy(col("event_type"))
      },
      Some("""
        WITH e AS (
          SELECT event_type AS g, user_id % 3 AS i,
                 CAST(ROUND(value * 100) AS BIGINT) AS x
          FROM events),
        per AS (
          SELECT g, i, CAST(count(*) AS BIGINT) AS ni,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx
          FROM e GROUP BY 1, 2),
        t AS (
          SELECT g, ni,
                 CASE WHEN ni >= 2 AND CAST(ni AS HUGEINT) * sxx
                        - CAST(sx AS HUGEINT) * sx > 0
                      THEN 1 ELSE 0 END AS ok,
                 CASE WHEN ni >= 2 AND CAST(ni AS HUGEINT) * sxx
                        - CAST(sx AS HUGEINT) * sx > 0
                      THEN ROUND(CAST(CAST(ni AS HUGEINT) * sxx
                          - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                        / CAST(ni AS DOUBLE), 9)
                      ELSE 0.0 END AS pool,
                 CASE WHEN ni >= 2 AND CAST(ni AS HUGEINT) * sxx
                        - CAST(sx AS HUGEINT) * sx > 0
                      THEN ROUND((CAST(ni AS DOUBLE) - 1.0)
                        * ln(CAST(CAST(ni AS HUGEINT) * sxx
                            - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                          / (CAST(ni AS DOUBLE)
                             * (CAST(ni AS DOUBLE) - 1.0))), 9)
                      ELSE 0.0 END AS lsum,
                 CASE WHEN ni >= 2 AND CAST(ni AS HUGEINT) * sxx
                        - CAST(sx AS HUGEINT) * sx > 0
                      THEN ROUND(1.0 / (CAST(ni AS DOUBLE) - 1.0), 9)
                      ELSE 0.0 END AS hsum
          FROM per),
        a AS (
          SELECT g, CAST(count(*) AS BIGINT) AS k,
                 CAST(SUM(ni) AS BIGINT) AS n,
                 MIN(ok) AS allok,
                 SUM(CAST(pool AS DECIMAL(38,12))) AS p,
                 SUM(CAST(lsum AS DECIMAL(38,12))) AS l,
                 SUM(CAST(hsum AS DECIMAL(38,12))) AS h
          FROM t GROUP BY 1)
        SELECT g AS event_type, k, n,
               ROUND((CAST(n - k AS DOUBLE)
                      * ln(CAST(p AS DOUBLE) / CAST(n - k AS DOUBLE))
                      - CAST(l AS DOUBLE))
                 / (1.0 + (CAST(h AS DOUBLE)
                           - 1.0 / CAST(n - k AS DOUBLE))
                    / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6) AS b_stat,
               CASE WHEN ROUND((CAST(n - k AS DOUBLE)
                      * ln(CAST(p AS DOUBLE) / CAST(n - k AS DOUBLE))
                      - CAST(l AS DOUBLE))
                 / (1.0 + (CAST(h AS DOUBLE)
                           - 1.0 / CAST(n - k AS DOUBLE))
                    / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6)
                 > CAST(59915 AS DOUBLE) / 10000.0
                 THEN 'heteroscedastic' ELSE 'homoscedastic'
                 END AS verdict
        FROM a
        WHERE allok = 1 AND k >= 2
        ORDER BY event_type
      """)),

    // Wilson 95% score interval for each event type's conversion
    // rate (value ≥ 100) — the proportion CI that stays inside
    // [0, 1] and keeps width at p̂ near 0/1 where the Wald interval
    // collapses; the per-group readout layer under q_ab_test's
    // verdicts. One IEEE sequence per bound from exact (n, c),
    // micro-snapped (AbTest.wilsonCi scaladoc).
    QueryDef(
      "q_wilson_ci",
      (s, dir) => {
        import graft.operators.AbTest
        AbTest.wilsonCi(
            Tables.events(s, dir), "event_type",
            col("value") >= 100.0)
          .orderBy(col("event_type"))
      },
      Some("""
        WITH a AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS c
          FROM events GROUP BY 1)
        SELECT event_type, n, c,
               CAST(ROUND((
                 (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                  + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE)))
                 / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))
                 - 1.96 * sqrt(
                     (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     / CAST(n AS DOUBLE)
                     + 1.96 * 1.96
                       / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))
                 ) * 1e6) AS BIGINT) AS lo_micro,
               CAST(ROUND((
                 (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                  + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE)))
                 / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))
                 + 1.96 * sqrt(
                     (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     / CAST(n AS DOUBLE)
                     + 1.96 * 1.96
                       / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))
                 ) * 1e6) AS BIGINT) AS hi_micro
        FROM a
        ORDER BY event_type
      """)),

    // Partial autocorrelation at lags 1..3 on the q_acf daily
    // series: ACF's identification partner — does lag ℓ add signal
    // AFTER the shorter lags (the AR-order cutoff a forecasting
    // layer reads before fitting Holt/Holt-Winters). Closed-form
    // Durbin-Levinson over the exact DECIMAL-widened r lattice;
    // each φ one mirrored IEEE sequence, micro edge
    // (ChangePoint.pacf scaladoc).
    QueryDef(
      "q_pacf",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("i", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("day"))))
        graft.operators.ChangePoint.pacf(daily, "event_type", "i", "x")
          .orderBy(col("event_type"), col("lag"))
      },
      Some("""
        WITH series AS (
          SELECT event_type,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, CAST(x AS BIGINT) AS x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) AS i
          FROM series),
        tot AS (
          SELECT event_type, COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx
          FROM idx GROUP BY 1),
        lags AS (SELECT unnest([1, 2, 3]) AS lag),
        pairs AS (
          SELECT h.event_type, l.lag, h.x AS xh, t.x AS xt
          FROM idx h
          CROSS JOIN lags l
          JOIN idx t ON t.event_type = h.event_type
                    AND t.i = h.i + l.lag),
        perlag AS (
          SELECT event_type, lag,
                 SUM(CAST(xh AS HUGEINT) * xt) AS sxy,
                 CAST(SUM(xh) AS BIGINT) AS sh,
                 CAST(SUM(xt) AS BIGINT) AS st
          FROM pairs GROUP BY 1, 2),
        nd AS (
          SELECT p.event_type, t.n, p.lag,
                 CAST(t.n AS HUGEINT) * t.n * p.sxy
                   - CAST(t.n AS HUGEINT) * t.sx * (p.sh + p.st)
                   + CAST(t.n - p.lag AS HUGEINT) * t.sx * t.sx AS num,
                 CAST(t.n AS HUGEINT) * t.n * t.sxx
                   - CAST(t.n AS HUGEINT) * t.sx * t.sx AS den
          FROM perlag p JOIN tot t USING (event_type)
          WHERE t.n > 4
            AND CAST(t.n AS HUGEINT) * t.sxx
                <> CAST(t.sx AS HUGEINT) * t.sx),
        piv AS (
          SELECT event_type, n, den,
                 MAX(CASE WHEN lag = 1 THEN num END) AS n1,
                 MAX(CASE WHEN lag = 2 THEN num END) AS n2,
                 MAX(CASE WHEN lag = 3 THEN num END) AS n3
          FROM nd GROUP BY 1, 2, 3
          HAVING den * den
                 <> MAX(CASE WHEN lag = 1 THEN num END)
                    * MAX(CASE WHEN lag = 1 THEN num END)),
        r AS (
          SELECT event_type, n,
                 CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
                 CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
                 CAST(n3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3
          FROM piv),
        s1 AS (SELECT *, (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
               FROM r),
        s2 AS (SELECT *, r1 - p22 * r1 AS p21 FROM s1),
        s3 AS (SELECT *, 1.0 - p21 * r1 - p22 * r2 AS d3 FROM s2),
        outp AS (
          SELECT event_type, 1 AS lag, n, r1 AS phi, TRUE AS keep
          FROM s3
          UNION ALL
          SELECT event_type, 2, n, p22, TRUE FROM s3
          UNION ALL
          SELECT event_type, 3, n,
                 (r3 - p21 * r2 - p22 * r1) / d3, d3 <> 0.0
          FROM s3)
        SELECT event_type, CAST(lag AS BIGINT) AS lag,
               CAST(n AS BIGINT) AS n,
               CAST(ROUND(phi * 1e6) AS BIGINT) AS phi_micro
        FROM outp WHERE keep
        ORDER BY event_type, lag
      """)),

    // Streaming twin of q_wasserstein: two value→count maps per
    // event type (the q_stream_energy state bound); every trigger
    // re-derives the exact ECDF-area integer sum by one merged
    // sorted walk, and the micro edge is the batch operator's own
    // column sequence. Shares q_wasserstein's oracle
    // (StreamingOps.wassersteinHistory scaladoc).
    QueryDef(
      "q_stream_wasserstein",
      (s, dir) =>
        graft.streaming.StreamingOps.wassersteinHistory(
            s, s"$dir/events.parquet")
          .orderBy(col("event_type")),
      Some(wassersteinOracle)),

    // Streaming twin of q_dickey_fuller: the same calendar
    // day→count rollup state as q_stream_dispersion; every trigger
    // re-derives the exact six lag-pair regression sums by one
    // sorted walk, combined by the batch dickeyFullerFromSums with
    // both refusals intact. Shares q_dickey_fuller's oracle
    // (StreamingOps.dickeyFullerHistory scaladoc).
    QueryDef(
      "q_stream_dickey_fuller",
      (s, dir) =>
        graft.streaming.StreamingOps.dickeyFullerHistory(
            s, s"$dir/events.parquet")
          .orderBy(col("event_type")),
      Some(dickeyFullerOracle)),

    // Streaming twin of q_smd_balance: the six per-cohort
    // sufficient statistics as O(1) mapGroupsWithState per event
    // type, combined by the batch smdFromCounts — watch assignment
    // balance DURING an experiment ramp, not after. Shares
    // q_smd_balance's oracle (StreamingOps.smdHistory scaladoc).
    QueryDef(
      "q_stream_smd",
      (s, dir) =>
        graft.streaming.StreamingOps.smdHistory(
            s, s"$dir/events.parquet")
          .orderBy(col("event_type")),
      Some(smdOracle)),

    // Streaming twin of q_dispersion: the calendar day→count rollup
    // as mapGroupsWithState (the q_stream_mann_kendall state bound);
    // every trigger emits exact (n, Σc, Σc²) and the batch
    // dispersionFromCounts combine applies the identical verdict
    // cross-multiplication. Shares q_dispersion's oracle
    // (StreamingOps.dispersionHistory scaladoc).
    QueryDef(
      "q_stream_dispersion",
      (s, dir) =>
        graft.streaming.StreamingOps.dispersionHistory(
            s, s"$dir/events.parquet")
          .orderBy(col("event_type")),
      Some(dispersionOracle)),

    // Streaming twin of q_gtest: per-cell counts accumulate as O(1)
    // mapGroupsWithState keyed by contingency CELL (a commutative
    // fold — no global map), then the batch operator's own
    // gTestFromCells combine runs over the latest cells. Shares
    // q_gtest's oracle (StreamingOps.gtestHistory scaladoc).
    QueryDef(
      "q_stream_gtest",
      (s, dir) =>
        graft.streaming.StreamingOps.gtestHistory(
          s, s"$dir/events.parquet", crit4 = 155073L),
      Some(gtestOracle)),

    // Streaming twin of q_cmh: the four per-stratum counts are the
    // test's complete sufficient statistics, kept as O(1)
    // mapGroupsWithState per stratum; the χ² combine is the batch
    // operator's own cmhFromCounts. Shares q_cmh's oracle
    // (StreamingOps.cmhHistory scaladoc).
    QueryDef(
      "q_stream_cmh",
      (s, dir) =>
        graft.streaming.StreamingOps.cmhHistory(
          s, s"$dir/events.parquet", crit4 = 38415L),
      Some(cmhOracle)),

    // Restricted mean survival time at a 30-day horizon over the
    // SAME signup→purchase durations as q_survival (in seconds):
    // the area under the KM curve to τ — "expected days-to-convert
    // within the first 30, counting the users who never did" — the
    // summary that exists even when the median doesn't (km never
    // crossing 0.5). km·10⁶ steps × integer widths on a DECIMAL
    // lattice, one 6-dp edge (Survival.rmst scaladoc).
    QueryDef(
      "q_rmst",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val t0 = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
        val dur = e.join(t0, "user_id")
          .groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "purchase" &&
            col("us") > col("t0"), col("us"))).as("tp"),
            max(col("us")).as("tmax"), max(col("t0")).as("t00"))
          .select(
            expr("(CASE WHEN tp IS NOT NULL THEN tp - t00 " +
              "ELSE tmax - t00 END) div 1000000").as("duration"),
            when(col("tp").isNotNull, 1L).otherwise(0L).as("event"))
        graft.operators.Survival.rmst(
          dur, "duration", "event", tau = 2592000L)
      },
      Some("""
        WITH RECURSIVE e AS (
          SELECT user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        t0 AS (SELECT user_id, min(us) AS t0 FROM e
               WHERE event_type = 'signup' GROUP BY 1),
        dur AS (
          SELECT (CASE WHEN tp IS NOT NULL THEN tp - t00
                       ELSE tmax - t00 END) // 1000000 AS duration,
                 CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS event
          FROM (
            SELECT e.user_id,
                   min(CASE WHEN e.event_type = 'purchase'
                            AND e.us > t0.t0 THEN e.us END) AS tp,
                   max(e.us) AS tmax, max(t0.t0) AS t00
            FROM e JOIN t0 USING (user_id)
            GROUP BY 1)),
        byt AS (
          SELECT duration AS t, count(*) AS alln,
                 CAST(sum(event) AS BIGINT) AS d
          FROM dur GROUP BY 1),
        risked AS (
          SELECT t, d,
                 CAST(SUM(alln) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n
          FROM byt),
        steps AS (
          SELECT t, n, d,
                 ROUND(1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 9)
                   AS factor,
                 ROW_NUMBER() OVER (ORDER BY t) AS i
          FROM risked WHERE d >= 1),
        rec AS (
          SELECT i, factor AS km FROM steps WHERE i = 1
          UNION ALL
          SELECT s.i, r.km * s.factor
          FROM rec r JOIN steps s ON s.i = r.i + 1),
        km6 AS (
          SELECT s.t, CAST(ROUND(ROUND(rec.km, 6) * 1e6) AS BIGINT)
                   AS km_micro,
                 ROUND(rec.km, 6) AS km
          FROM steps s JOIN rec USING (i)),
        iv AS (
          SELECT t, km, km_micro,
                 COALESCE(LAG(km_micro) OVER (ORDER BY t), 1000000)
                   AS pkm_micro,
                 COALESCE(LAG(t) OVER (ORDER BY t), 0) AS pt
          FROM km6),
        area AS (
          SELECT CAST(count(*) AS BIGINT) AS n_steps,
                 SUM(CAST(pkm_micro AS HUGEINT) *
                     (LEAST(t, 2592000) - LEAST(pt, 2592000))) AS head,
                 MAX(t) AS last_t,
                 arg_max(km_micro, t) AS last_km_micro
          FROM iv)
        SELECT CAST(2592000 AS BIGINT) AS tau, n_steps,
               ROUND(CAST(head + CAST(last_km_micro AS HUGEINT) *
                 GREATEST(2592000 - last_t, 0) AS DOUBLE) / 1e6, 6)
                 AS rmst
        FROM area
        -- mirror the operator's empty-curve refusal: with zero
        -- death steps the global aggregate would still emit one
        -- NULL-rmst row while Survival.rmst returns zero rows
        WHERE n_steps > 0
      """))
  )

  /** The SPRT replay shared by q_sprt and its streaming twin: the
    * p0=0.30→p1=0.40, α=β=0.05 constants on the log10 micro lattice
    * (124939 / −66947 per observation, ±1278754 boundaries) —
    * pinned once, identical to AbTest.sprt's driver-computed
    * literals.
    */
  private lazy val sprtOracle: String = """
        WITH g AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END)
                   AS BIGINT) AS successes
          FROM events GROUP BY 1)
        SELECT event_type, n, successes,
               successes * 124939 + (n - successes) * -66947
                 AS llr_micro,
               CASE WHEN successes * 124939 + (n - successes) * -66947
                         >= 1278754 THEN 'accept_h1'
                    WHEN successes * 124939 + (n - successes) * -66947
                         <= -1278754 THEN 'accept_h0'
                    ELSE 'continue' END AS decision
        FROM g ORDER BY event_type
      """

  /** The Friedman complete-block doubled-rank replay (no WITH
    * keyword; ends in the `fr` CTE) shared by q_friedman and
    * q_kendall_w — W reads the same chain through the
    * χ² = m(k−1)W identity.
    */
  private lazy val friedmanCtes: String = """obs AS (
          SELECT user_id % 3 AS cohort, CAST(ts AS DATE) AS b,
                 event_type AS t, CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2, 3),
        kp AS (SELECT cohort, count(DISTINCT t) AS k FROM obs GROUP BY 1),
        comp AS (
          SELECT o.cohort, o.b
          FROM obs o JOIN kp USING (cohort)
          GROUP BY o.cohort, o.b, kp.k
          HAVING count(*) = kp.k),
        kept AS (SELECT o.* FROM obs o JOIN comp USING (cohort, b)),
        ranked AS (
          SELECT cohort, t,
                 2 * RANK() OVER (PARTITION BY cohort, b ORDER BY x)
                   + COUNT(*) OVER (PARTITION BY cohort, b, x) - 1 AS r2
          FROM kept),
        rt AS (
          SELECT cohort, t, CAST(SUM(r2) AS BIGINT) AS rt
          FROM ranked GROUP BY 1, 2),
        nb AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n
               FROM comp GROUP BY 1),
        sq AS (
          SELECT cohort, CAST(count(*) AS BIGINT) AS kt,
                 SUM(CAST(rt AS DECIMAL(38,0))
                     * CAST(rt AS DECIMAL(38,0))) AS s
          FROM rt GROUP BY 1),
        ties AS (
          SELECT cohort, CAST(SUM(tt*tt*tt - tt) AS BIGINT) AS tie
          FROM (SELECT cohort, b, x, CAST(count(*) AS BIGINT) AS tt
                FROM kept GROUP BY 1, 2, 3)
          GROUP BY 1),
        fr AS (
        SELECT sq.cohort,
               nb.n AS n_blocks, sq.kt AS k_treatments,
               CAST(ROUND((3.0 * CAST(s AS DOUBLE)
                           / (CAST(n AS DOUBLE) * CAST(kt AS DOUBLE)
                              * (CAST(kt AS DOUBLE) + 1.0))
                           - 3.0 * CAST(n AS DOUBLE)
                             * (CAST(kt AS DOUBLE) + 1.0)) * 1e6)
                 AS BIGINT) AS chi2_micro,
               CAST(ROUND((3.0 * CAST(s AS DOUBLE)
                           / (CAST(n AS DOUBLE) * CAST(kt AS DOUBLE)
                              * (CAST(kt AS DOUBLE) + 1.0))
                           - 3.0 * CAST(n AS DOUBLE)
                             * (CAST(kt AS DOUBLE) + 1.0))
                          / (1.0 - CAST(tie AS DOUBLE)
                             / (CAST(n AS DOUBLE) * CAST(kt AS DOUBLE)
                                * (CAST(kt AS DOUBLE)
                                   * CAST(kt AS DOUBLE) - 1.0)))
                          * 1e6)
                 AS BIGINT) AS chi2_tie_corrected_micro
        FROM sq
        JOIN nb USING (cohort) JOIN ties USING (cohort)
        WHERE sq.kt >= 2 AND nb.n >= 2
          AND ties.tie < nb.n * sq.kt * (sq.kt * sq.kt - 1))"""

  /** The PSI replay shared by q_psi and its streaming twin:
    * Laplace-smoothed shares over the union of occupied 10-dollar
    * bins, per-bin IEEE terms nano-snapped and integer-summed, one
    * micro edge.
    */
  private lazy val psiOracle: String = """
        WITH e AS (
          SELECT event_type, user_id % 2 = 1 AS b,
                 CAST(ROUND(value * 100) AS BIGINT) // 1000 AS bin
          FROM events),
        pb AS (
          SELECT event_type, bin,
                 CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
          FROM e GROUP BY 1, 2),
        mk AS (
          SELECT *,
                 SUM(ca) OVER (PARTITION BY event_type) AS na,
                 SUM(cb) OVER (PARTITION BY event_type) AS nb,
                 COUNT(*) OVER (PARTITION BY event_type) AS nbins
          FROM pb),
        tm AS (
          SELECT event_type, na, nb, nbins,
                 CAST(ROUND((
                     (CAST(ca AS DOUBLE) + 1.0)
                       / (CAST(na AS DOUBLE) + CAST(nbins AS DOUBLE))
                   - (CAST(cb AS DOUBLE) + 1.0)
                       / (CAST(nb AS DOUBLE) + CAST(nbins AS DOUBLE)))
                   * ln(((CAST(ca AS DOUBLE) + 1.0)
                         / (CAST(na AS DOUBLE)
                            + CAST(nbins AS DOUBLE)))
                        / ((CAST(cb AS DOUBLE) + 1.0)
                           / (CAST(nb AS DOUBLE)
                              + CAST(nbins AS DOUBLE))))
                   * 1e9) AS BIGINT) AS t
          FROM mk)
        SELECT event_type,
               CAST(MAX(na) AS BIGINT) AS n_a,
               CAST(MAX(nb) AS BIGINT) AS n_b,
               CAST(MAX(nbins) AS BIGINT) AS n_bins,
               CAST(ROUND(CAST(SUM(t) AS DOUBLE) / 1e9 * 1e6)
                 AS BIGINT) AS psi_micro
        FROM tm GROUP BY 1
        HAVING MAX(na) > 0 AND MAX(nb) > 0
        ORDER BY event_type
      """

  /** The mSPRT replay shared by q_msprt and its streaming twin:
    * exact integer sufficient statistics, the DECIMAL variance
    * identity, τ² = 10¹⁴/10¹² = 100 cents² exactly, the pinned ln10
    * constant, and the driver-computed integer reject boundary
    * −round(log₁₀(0.05)·10⁶) = 1301030.
    */
  private lazy val msprtOracle: String = """
        WITH e AS (
          SELECT event_type AS g, user_id % 2 = 1 AS b,
                 CAST(ROUND(value * 100) AS BIGINT) AS x
          FROM events),
        c AS (
          SELECT g,
                 CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
                 CAST(SUM(CASE WHEN NOT b THEN x ELSE 0 END) AS BIGINT)
                   AS sx_a,
                 CAST(SUM(CASE WHEN b THEN x ELSE 0 END) AS BIGINT)
                   AS sx_b,
                 SUM(CASE WHEN NOT b THEN CAST(x AS HUGEINT) * x
                     ELSE 0 END) AS sxx_a,
                 SUM(CASE WHEN b THEN CAST(x AS HUGEINT) * x
                     ELSE 0 END) AS sxx_b
          FROM e GROUP BY 1),
        m AS (
          SELECT g, n_a, n_b, sx_a, sx_b,
                 CAST(n_a AS HUGEINT) * sxx_a
                   - CAST(sx_a AS HUGEINT) * sx_a AS va,
                 CAST(n_b AS HUGEINT) * sxx_b
                   - CAST(sx_b AS HUGEINT) * sx_b AS vb
          FROM c WHERE n_a >= 2 AND n_b >= 2),
        s AS (
          SELECT g, n_a, n_b,
                 (CAST(va AS DOUBLE) / CAST(n_a AS DOUBLE)
                  + CAST(vb AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0)
                   AS sig2,
                 CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                   - CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                   AS delta
          FROM m),
        t AS (
          SELECT g, n_a, n_b, delta,
                 sig2 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS s2,
                 CAST(100000000000000 AS DOUBLE) / 1e12 AS tau2
          FROM s),
        l AS (
          SELECT g, n_a, n_b, delta,
                 CAST(ROUND((0.5 * log10(s2 / (s2 + tau2))
                        + delta * delta * tau2
                          / (2.0 * s2 * (s2 + tau2))
                          / 2.302585092994046) * 1e6) AS BIGINT)
                   AS llr10_micro
          FROM t WHERE s2 > 0)
        SELECT g AS event_type, n_a, n_b,
               CAST(ROUND(delta * 1e6) AS BIGINT) AS delta_micro,
               llr10_micro,
               CASE WHEN llr10_micro >= 1301030 THEN 'reject_h0'
                    ELSE 'continue' END AS decision
        FROM l
        ORDER BY event_type
      """

  /** The energy-distance replay shared by q_energy_test and its
    * streaming twin: cumulative count/sum windows on the merged
    * order, exact HUGEINT pair sums, one IEEE sequence each for E
    * and T.
    */
  private lazy val energyOracle: String = """
        WITH e AS (
          SELECT event_type, user_id % 2 = 1 AS b,
                 CAST(ROUND(value * 100) AS BIGINT) AS x
          FROM events),
        m AS (
          SELECT event_type, b, x,
                 SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) OVER w AS ca,
                 SUM(CASE WHEN NOT b THEN CAST(x AS HUGEINT)
                          ELSE 0 END) OVER w AS sa,
                 SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) OVER wg AS na,
                 SUM(CASE WHEN NOT b THEN CAST(x AS HUGEINT)
                          ELSE 0 END) OVER wg AS ta,
                 COUNT(*) OVER wi AS rin,
                 SUM(CAST(x AS HUGEINT)) OVER wi AS sin
          FROM e
          WINDOW w AS (PARTITION BY event_type ORDER BY x
                       ROWS UNBOUNDED PRECEDING),
                 wg AS (PARTITION BY event_type),
                 wi AS (PARTITION BY event_type, b ORDER BY x
                        ROWS UNBOUNDED PRECEDING)),
        ag AS (
          SELECT event_type,
                 CAST(MAX(na) AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
                 SUM(CASE WHEN b THEN
                       CAST(x AS HUGEINT) * (2 * ca - na)
                         - 2 * sa + ta
                     ELSE 0 END) AS ab_sum,
                 SUM(CASE WHEN NOT b THEN
                       CAST(x AS HUGEINT) * (rin - 1) - (sin - x)
                     ELSE 0 END) AS aa_sum,
                 SUM(CASE WHEN b THEN
                       CAST(x AS HUGEINT) * (rin - 1) - (sin - x)
                     ELSE 0 END) AS bb_sum
          FROM m GROUP BY 1)
        SELECT event_type, n_a, n_b,
               CAST(ab_sum AS BIGINT) AS ab_sum,
               CAST(aa_sum AS BIGINT) AS aa_sum,
               CAST(bb_sum AS BIGINT) AS bb_sum,
               CAST(ROUND((2.0 * CAST(ab_sum AS DOUBLE)
                      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                    - 2.0 * CAST(aa_sum AS DOUBLE)
                      / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))
                    - 2.0 * CAST(bb_sum AS DOUBLE)
                      / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)))
                   * 1e6) AS BIGINT) AS e_micro,
               CAST(ROUND(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    / CAST(n_a + n_b AS DOUBLE)
                    * (2.0 * CAST(ab_sum AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                     - 2.0 * CAST(aa_sum AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))
                     - 2.0 * CAST(bb_sum AS DOUBLE)
                       / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)))
                   * 1e6) AS BIGINT) AS t_micro
        FROM ag
        WHERE n_a > 0 AND n_b > 0
        ORDER BY event_type
      """

  /** The Mann-Kendall daily-rollup replay shared by q_mann_kendall
    * and its streaming twin.
    */
  private lazy val mannKendallOracle: String = """
        WITH daily AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   AS di,
                 CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events GROUP BY 1, 2),
        p AS (
          SELECT a.event_type,
                 CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                               WHEN b.cents < a.cents THEN -1
                               ELSE 0 END) AS BIGINT) AS s_stat
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.di < b.di
          GROUP BY 1),
        nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
               FROM daily GROUP BY 1),
        ties AS (
          SELECT event_type,
                 CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
          FROM (SELECT event_type, cents, count(*) AS t
                FROM daily GROUP BY 1, 2)
          GROUP BY 1)
        SELECT nn.event_type, nn.n, p.s_stat,
               CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie AS BIGINT)
                 AS var_num,
               CAST(ROUND((CASE WHEN p.s_stat > 0
                                THEN CAST(p.s_stat - 1 AS DOUBLE)
                                WHEN p.s_stat < 0
                                THEN CAST(p.s_stat + 1 AS DOUBLE)
                                ELSE 0.0 END
                           / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                                       - t.tie AS DOUBLE) / 18.0))
                          * 1000000.0) AS BIGINT) AS z_micro
        FROM nn JOIN p USING (event_type) JOIN ties t USING (event_type)
        WHERE nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie > 0
        ORDER BY event_type
      """

  /** The Kaplan-Meier / Nelson-Aalen replay shared by q_survival and
    * q_median_survival (full SQL including the RECURSIVE keyword).
    */
  /** Batch oracle shared by q_adf and its streaming twin. */
  private lazy val adfOracle: String = """
        WITH series AS (
          SELECT event_type,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, CAST(x AS BIGINT) AS x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) AS i
          FROM series),
        tr AS (
          SELECT event_type,
                 x - LAG(x) OVER (PARTITION BY event_type ORDER BY i)
                   AS v,
                 LAG(x) OVER (PARTITION BY event_type ORDER BY i) AS p,
                 LAG(x) OVER (PARTITION BY event_type ORDER BY i)
                   - LAG(x, 2) OVER (PARTITION BY event_type ORDER BY i)
                   AS q
          FROM idx),
        a AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS sv,
                 CAST(SUM(p) AS BIGINT) AS sp,
                 CAST(SUM(q) AS BIGINT) AS sq,
                 SUM(CAST(v AS HUGEINT) * p) AS svp0,
                 SUM(CAST(v AS HUGEINT) * q) AS svq0,
                 SUM(CAST(p AS HUGEINT) * q) AS spq0,
                 SUM(CAST(p AS HUGEINT) * p) AS spp0,
                 SUM(CAST(q AS HUGEINT) * q) AS sqq0,
                 SUM(CAST(v AS HUGEINT) * v) AS svv0
          FROM tr WHERE q IS NOT NULL GROUP BY 1),
        ctr AS (
          SELECT event_type, n,
                 CAST(n AS HUGEINT) * spp0
                   - CAST(sp AS HUGEINT) * sp AS spp,
                 CAST(n AS HUGEINT) * sqq0
                   - CAST(sq AS HUGEINT) * sq AS sqq,
                 CAST(n AS HUGEINT) * spq0
                   - CAST(sp AS HUGEINT) * sq AS spq,
                 CAST(n AS HUGEINT) * svp0
                   - CAST(sv AS HUGEINT) * sp AS svp,
                 CAST(n AS HUGEINT) * svq0
                   - CAST(sv AS HUGEINT) * sq AS svq,
                 CAST(n AS HUGEINT) * svv0
                   - CAST(sv AS HUGEINT) * sv AS svv
          FROM a),
        sol AS (
          SELECT event_type, n, spp, sqq, spq, svp, svq, svv,
                 CAST(spp AS DOUBLE) * CAST(sqq AS DOUBLE)
                   - CAST(spq AS DOUBLE) * CAST(spq AS DOUBLE) AS det
          FROM ctr
          WHERE n >= 5 AND spp > 0 AND spp * sqq <> spq * spq),
        bc AS (
          SELECT *, (CAST(svp AS DOUBLE) * CAST(sqq AS DOUBLE)
                     - CAST(svq AS DOUBLE) * CAST(spq AS DOUBLE)) / det
                   AS b,
                 (CAST(svq AS DOUBLE) * CAST(spp AS DOUBLE)
                  - CAST(svp AS DOUBLE) * CAST(spq AS DOUBLE)) / det
                   AS c
          FROM sol),
        rs AS (
          SELECT *, CAST(svv AS DOUBLE) - b * CAST(svp AS DOUBLE)
                   - c * CAST(svq AS DOUBLE) AS rssu
          FROM bc),
        t AS (
          SELECT event_type, n,
                 CAST(ROUND(b * 1e6) AS BIGINT) AS beta_micro,
                 CAST(ROUND(b / sqrt(rssu * CAST(sqq AS DOUBLE)
                     / ((CAST(n AS DOUBLE) - 3.0) * det)) * 1e6)
                   AS BIGINT) AS t_micro
          FROM rs WHERE rssu > 0.0)
        SELECT event_type, n, beta_micro, t_micro,
               CASE WHEN t_micro < -2860000 THEN 'stationary'
                    ELSE 'unit_root' END AS verdict
        FROM t
        ORDER BY event_type
      """

  /** Batch oracle shared by q_dickey_fuller and its streaming twin. */
  private lazy val dickeyFullerOracle: String = """
        WITH series AS (
          SELECT event_type,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, CAST(x AS BIGINT) AS x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) AS i
          FROM series),
        pr AS (
          SELECT event_type,
                 LAG(x) OVER (PARTITION BY event_type ORDER BY i) AS u,
                 x - LAG(x) OVER (PARTITION BY event_type ORDER BY i)
                   AS v
          FROM idx),
        a AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(u) AS BIGINT) AS su,
                 CAST(SUM(v) AS BIGINT) AS sv,
                 SUM(CAST(u AS HUGEINT) * u) AS suu0,
                 SUM(CAST(u AS HUGEINT) * v) AS suv0,
                 SUM(CAST(v AS HUGEINT) * v) AS svv0
          FROM pr WHERE u IS NOT NULL GROUP BY 1),
        c AS (
          SELECT event_type, n,
                 CAST(n AS HUGEINT) * suu0
                   - CAST(su AS HUGEINT) * su AS suu,
                 CAST(n AS HUGEINT) * suv0
                   - CAST(su AS HUGEINT) * sv AS suv,
                 CAST(n AS HUGEINT) * svv0
                   - CAST(sv AS HUGEINT) * sv AS svv
          FROM a),
        t AS (
          SELECT event_type, n,
                 CAST(ROUND(CAST(suv AS DOUBLE) / CAST(suu AS DOUBLE)
                   * 1e6) AS BIGINT) AS beta_micro,
                 CAST(ROUND(
                   (CAST(suv AS DOUBLE) / CAST(suu AS DOUBLE))
                   / sqrt((CAST(svv AS DOUBLE)
                       - CAST(suv AS DOUBLE) * CAST(suv AS DOUBLE)
                         / CAST(suu AS DOUBLE))
                     / ((CAST(n AS DOUBLE) - 2.0)
                        * CAST(suu AS DOUBLE)))
                   * 1e6) AS BIGINT) AS t_micro
          FROM c WHERE n >= 4 AND suu > 0 AND svv * suu > suv * suv)
        SELECT event_type, n, beta_micro, t_micro,
               CASE WHEN t_micro < -2860000 THEN 'stationary'
                    ELSE 'unit_root' END AS verdict
        FROM t
        ORDER BY event_type
      """

  /** Batch oracle shared by q_smd_balance and its streaming twin. */
  private lazy val smdOracle: String = """
        WITH e AS (
          SELECT event_type, user_id % 2 = 1 AS b,
                 CAST(ROUND(value * 100) AS BIGINT) AS x
          FROM events),
        a AS (
          SELECT event_type,
                 CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(SUM(CASE WHEN NOT b THEN x ELSE 0 END) AS BIGINT)
                   AS sxa,
                 SUM(CASE WHEN NOT b THEN CAST(x AS HUGEINT) * x
                     ELSE 0 END) AS sxxa,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
                 CAST(SUM(CASE WHEN b THEN x ELSE 0 END) AS BIGINT)
                   AS sxb,
                 SUM(CASE WHEN b THEN CAST(x AS HUGEINT) * x
                     ELSE 0 END) AS sxxb
          FROM e GROUP BY 1),
        v AS (
          SELECT event_type, n_a, n_b,
                 CAST(CAST(n_a AS HUGEINT) * sxxa
                      - CAST(sxa AS HUGEINT) * sxa AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
                   AS va,
                 CAST(CAST(n_b AS HUGEINT) * sxxb
                      - CAST(sxb AS HUGEINT) * sxb AS DOUBLE)
                   / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
                   AS vb,
                 CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE)
                   - CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE) AS md
          FROM a WHERE n_a >= 2 AND n_b >= 2)
        SELECT event_type, n_a, n_b,
               CAST(ROUND(md / sqrt((va + vb) / 2.0) * 1e6) AS BIGINT)
                 AS smd_micro,
               CASE WHEN ABS(CAST(ROUND(md / sqrt((va + vb) / 2.0)
                      * 1e6) AS BIGINT)) < 100000
                    THEN 'balanced' ELSE 'imbalanced' END AS verdict
        FROM v
        WHERE va + vb > 0.0
        ORDER BY event_type
      """

  /** Batch oracle shared by q_dispersion and its streaming twin. */
  private lazy val dispersionOracle: String = """
        WITH daily AS (
          SELECT event_type,
                 date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        a AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx
          FROM daily GROUP BY 1)
        SELECT event_type, n,
               CAST(ROUND(CAST(CAST(n AS HUGEINT) * sxx
                   - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / CAST(s AS DOUBLE) * 1e6) AS BIGINT) AS d_micro,
               CASE WHEN 625 * (CAST(n AS HUGEINT) * sxx
                      - CAST(s AS HUGEINT) * s
                      - CAST(n - 1 AS HUGEINT) * s)
                    * (CAST(n AS HUGEINT) * sxx
                      - CAST(s AS HUGEINT) * s
                      - CAST(n - 1 AS HUGEINT) * s)
                    > CAST(2401 AS HUGEINT) * 2 * (n - 1) * s * s
                 THEN CASE WHEN CAST(n AS HUGEINT) * sxx
                        - CAST(s AS HUGEINT) * s
                        - CAST(n - 1 AS HUGEINT) * s > 0
                      THEN 'overdispersed' ELSE 'underdispersed' END
                 ELSE 'poisson' END AS verdict
        FROM a
        WHERE n >= 2 AND s > 0
        ORDER BY event_type
      """

  /** Batch oracle shared by q_wasserstein and its streaming twin. */
  private lazy val wassersteinOracle: String = """
        WITH e AS (
          SELECT event_type, user_id % 2 = 1 AS b,
                 CAST(ROUND(value * 100) AS BIGINT) AS v
          FROM events),
        pv AS (
          SELECT event_type, v,
                 CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
          FROM e GROUP BY 1, 2),
        st AS (
          SELECT event_type,
                 SUM(ca) OVER wc AS cuma, SUM(cb) OVER wc AS cumb,
                 SUM(ca) OVER wg AS na, SUM(cb) OVER wg AS nb,
                 COALESCE(LEAD(v) OVER wo - v, 0) AS gap
          FROM pv
          WINDOW wc AS (PARTITION BY event_type ORDER BY v
                        ROWS UNBOUNDED PRECEDING),
                 wo AS (PARTITION BY event_type ORDER BY v),
                 wg AS (PARTITION BY event_type)),
        a AS (
          SELECT event_type, MAX(na) AS n_a, MAX(nb) AS n_b,
                 SUM(ABS(CAST(cuma AS HUGEINT) * nb
                         - CAST(cumb AS HUGEINT) * na) * gap) AS num
          FROM st WHERE na > 0 AND nb > 0 GROUP BY 1)
        SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               CAST(ROUND(CAST(num AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) * 1e6)
                 AS BIGINT) AS w1_micro
        FROM a
        ORDER BY event_type
      """

  /** Batch oracle shared by q_gtest and its streaming twin. NULL
    * categories are excluded HERE too, matching the operator's
    * pre-aggregation drop — without the filter, NULL-keyed cells
    * would inflate n via SUM(o) while vanishing from the per-cell
    * terms through the equi-joins (fixtures currently have no NULL
    * keys; the conventions must still agree).
    */
  private lazy val gtestOracle: String = """
        WITH e AS (
          SELECT event_type AS a, user_id % 3 AS b FROM events
          WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        cells AS (SELECT a, b, count(*) AS o FROM e GROUP BY 1, 2),
        rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                       count(DISTINCT a) AS nr, count(DISTINCT b) AS nc
                FROM cells),
        terms AS (
          SELECT t.n, t.nr, t.nc,
                 ROUND(CAST(o AS DOUBLE) *
                   ln(CAST(o AS DOUBLE) * CAST(t.n AS DOUBLE)
                      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))), 9)
                   AS term
          FROM cells
          JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot t),
        agg AS (
          SELECT n, nr, nc, SUM(CAST(term AS DECIMAL(38,12))) AS terms
          FROM terms GROUP BY 1, 2, 3)
        SELECT n, nr, nc,
               CAST((nr - 1) * (nc - 1) AS BIGINT) AS df,
               ROUND(CAST(terms AS DOUBLE) * 2.0, 6) AS g_stat,
               CASE WHEN terms * CAST(20000 AS DECIMAL(38,12))
                       > CAST(155073 AS DECIMAL(38,12))
                    THEN 'dependent' ELSE 'independent' END AS verdict
        FROM agg
      """

  /** Batch oracle shared by q_cmh and its streaming twin. */
  private lazy val cmhOracle: String = """
        WITH e AS (
          SELECT event_type AS st,
                 user_id % 2 = 1 AS b,
                 value >= 100.0 AS y
          FROM events),
        per AS (
          SELECT st, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                   AS m1,
                 CAST(SUM(CASE WHEN b AND y THEN 1 ELSE 0 END)
                   AS BIGINT) AS o
          FROM e GROUP BY 1),
        terms AS (
          SELECT o,
                 (n1 * m1) // n AS eq,
                 CAST(ROUND(CAST((n1 * m1) % n AS DOUBLE)
                      / CAST(n AS DOUBLE) * 1e9) AS BIGINT) AS er,
                 CAST(ROUND(CAST(n1 AS DOUBLE)
                      * CAST(n - n1 AS DOUBLE)
                      * CAST(m1 AS DOUBLE)
                      * CAST(n - m1 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0))
                      * 1e9) AS BIGINT) AS vn
          FROM per WHERE n >= 2),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS k_strata,
                 CAST(SUM(o) AS BIGINT) AS o,
                 CAST(SUM(eq) AS BIGINT) AS eqsum,
                 CAST(SUM(er) AS BIGINT) AS ersum,
                 CAST(SUM(vn) AS BIGINT) AS v_nano
          FROM terms)
        SELECT k_strata, o,
               eqsum * 1000000000 + ersum AS e_nano, v_nano,
               CAST(ROUND(
                 (CAST(o AS DOUBLE)
                  - (CAST(eqsum AS DOUBLE)
                     + CAST(ersum AS DOUBLE) / 1e9))
                 * (CAST(o AS DOUBLE)
                    - (CAST(eqsum AS DOUBLE)
                       + CAST(ersum AS DOUBLE) / 1e9))
                 / (CAST(v_nano AS DOUBLE) / 1e9) * 1e6) AS BIGINT)
                 AS chi2_micro,
               CASE WHEN CAST(ROUND(
                 (CAST(o AS DOUBLE)
                  - (CAST(eqsum AS DOUBLE)
                     + CAST(ersum AS DOUBLE) / 1e9))
                 * (CAST(o AS DOUBLE)
                    - (CAST(eqsum AS DOUBLE)
                       + CAST(ersum AS DOUBLE) / 1e9))
                 / (CAST(v_nano AS DOUBLE) / 1e9) * 1e6) AS BIGINT)
                 > 3841500 THEN 'dependent'
                 ELSE 'independent' END AS verdict
        FROM agg
        WHERE v_nano > 0
      """

  private lazy val survivalOracle: String = """
        WITH RECURSIVE e AS (
          SELECT user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        t0 AS (SELECT user_id, min(us) AS t0 FROM e
               WHERE event_type = 'signup' GROUP BY 1),
        dur AS (
          SELECT CASE WHEN tp IS NOT NULL THEN tp - t00
                      ELSE tmax - t00 END AS duration,
                 CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS event
          FROM (
            SELECT e.user_id,
                   min(CASE WHEN e.event_type = 'purchase'
                            AND e.us > t0.t0 THEN e.us END) AS tp,
                   max(e.us) AS tmax, max(t0.t0) AS t00
            FROM e JOIN t0 USING (user_id)
            GROUP BY 1)),
        byt AS (
          SELECT duration AS t, count(*) AS alln,
                 CAST(sum(event) AS BIGINT) AS d
          FROM dur GROUP BY 1),
        risked AS (
          SELECT t, d,
                 CAST(SUM(alln) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n
          FROM byt),
        steps AS (
          SELECT t, n, d,
                 ROUND(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 9)
                   AS term,
                 ROUND(1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 9)
                   AS factor,
                 ROW_NUMBER() OVER (ORDER BY t) AS i
          FROM risked WHERE d >= 1),
        rec AS (
          SELECT i, factor AS km FROM steps WHERE i = 1
          UNION ALL
          SELECT s.i, r.km * s.factor
          FROM rec r JOIN steps s ON s.i = r.i + 1),
        na AS (
          SELECT t, n, d, i,
                 SUM(CAST(term AS DECIMAL(38,12)))
                   OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cumhaz
          FROM steps)
        SELECT na.t, na.n AS n_risk, na.d AS n_events,
               ROUND(rec.km, 6) AS km,
               ROUND(CAST(na.cumhaz AS DOUBLE), 6) AS na_cumhaz
        FROM na JOIN rec USING (i)
        ORDER BY na.t
      """

  /** The Holt-Winters recursive-CTE replay shared by q_holt_winters
    * and its streaming twin. The s_slot and l' subexpressions are
    * INLINED at every use — a lateral alias would silently resolve
    * to the recursive table's same-named column (the previous row's
    * value), a DuckDB name-resolution trap this oracle hit in
    * development; identical expressions produce identical IEEE bits,
    * so inlining preserves the bit-exact replay.
    */
  private lazy val holtWintersOracle: String = {
    val sold = "CASE (o.i - 1) % 4 WHEN 0 THEN r.s1 WHEN 1 THEN " +
      "r.s2 WHEN 2 THEN r.s3 ELSE r.s4 END"
    val lp = s"0.5 * (o.value - ($sold)) + 0.5 * (r.l + r.b)"
    val snew = s"0.5 * (o.value - ($lp)) + 0.5 * ($sold)"
    s"""
        WITH RECURSIVE ordered AS (
          SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS i
          FROM events),
        rec AS (
          SELECT user_id, i,
                 value AS l, CAST(0.0 AS DOUBLE) AS b,
                 CAST(0.0 AS DOUBLE) AS s1, CAST(0.0 AS DOUBLE) AS s2,
                 CAST(0.0 AS DOUBLE) AS s3, CAST(0.0 AS DOUBLE) AS s4
          FROM ordered WHERE i = 1
          UNION ALL
          SELECT o.user_id, o.i,
                 $lp AS l,
                 0.5 * (($lp) - r.l) + 0.5 * r.b AS b,
                 CASE WHEN (o.i - 1) % 4 = 0 THEN $snew
                      ELSE r.s1 END AS s1,
                 CASE WHEN (o.i - 1) % 4 = 1 THEN $snew
                      ELSE r.s2 END AS s2,
                 CASE WHEN (o.i - 1) % 4 = 2 THEN $snew
                      ELSE r.s3 END AS s3,
                 CASE WHEN (o.i - 1) % 4 = 3 THEN $snew
                      ELSE r.s4 END AS s4
          FROM rec r JOIN ordered o
            ON o.user_id = r.user_id AND o.i = r.i + 1),
        last AS (
          SELECT user_id, max(i) AS n FROM rec GROUP BY 1)
        SELECT r.user_id, CAST(l2.n AS BIGINT) AS n,
               ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
               ROUND(r.s1, 6) AS s0, ROUND(r.s2, 6) AS s1,
               ROUND(r.s3, 6) AS s2, ROUND(r.s4, 6) AS s3,
               ROUND(r.l + r.b +
                 CASE l2.n % 4 WHEN 0 THEN r.s1 WHEN 1 THEN r.s2
                      WHEN 2 THEN r.s3 ELSE r.s4 END, 6) AS forecast
        FROM rec r JOIN last l2
          ON r.user_id = l2.user_id AND r.i = l2.n
        ORDER BY r.user_id
      """
  }
}
