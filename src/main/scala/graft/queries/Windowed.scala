package graft.queries

import graft.Tables
import graft.transforms.{Dedup, Freshness, Timestamps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Window functions / sorts / limits / time semantics
  * (SURVEY §2.6 W1–W5, §2.5 A8, §2.9 T2) plus P5/P7 filter queries. */
object Windowed {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1/W2: top-N after sort (recapture cap shape).
    "q20_topn" -> ((s, dir) => {
      t(s, dir, "events")
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(90)
        .select(col("event_id"), col("ts"))
    }),
    // W3/P8: keep-first per key under explicit ordering (via Dedup lib).
    "q21_keep_first" -> ((s, dir) => {
      Dedup.keepFirstOrdered(t(s, dir, "events"),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id").as("first_event"), col("ts").as("first_ts"))
        .orderBy(col("user_id"))
    }),
    // A8: running sum per entity (rows frame).
    "q22_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_value",
          sum(col("value").cast(DecimalType(18, 2))).over(w).cast(DoubleType))
        .select(col("event_id"), col("user_id"), col("running_value"))
        .orderBy(col("event_id"))
    }),
    // A8: rolling 1h time-range window per entity (accumulated-rain shape).
    "q23_rolling_1h" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-3600, 0)
      t(s, dir, "events")
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("rolling_1h",
          sum(col("value").cast(DecimalType(18, 2))).over(w).cast(DoubleType))
        .select(col("event_id"), col("user_id"), col("ts_sec"), col("rolling_1h"))
        .orderBy(col("event_id"))
    }),
    // A8 wide form: the reference's accumulated-rain table carries MANY
    // rolling horizons as columns (5min…96h —
    // precipitacao_alertario/tasks.py:104-120); all four range frames
    // share one (user, ts) sort, so Catalyst plans a single
    // Exchange+Sort+Window — adding horizons is free of extra shuffles
    // (spec-asserted in PlansSpec).
    "q83_multi_horizon" -> ((s, dir) => {
      def acc(secs: Long, name: String): Column =
        sum(col("value").cast(DecimalType(18, 2)))
          .over(Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
            .rangeBetween(-secs, 0))
          .cast(DoubleType).as(name)
      t(s, dir, "events")
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts_sec"),
          acc(900, "acc_15min"), acc(3600, "acc_1h"),
          acc(14400, "acc_4h"), acc(86400, "acc_24h"))
        .orderBy(col("event_id"))
    }),
    // Prediction-buffer smoothing (the reference's per-camera Redis
    // buffer as a window op): majority of each user's last 3 non-null
    // labels; 'error' events are failed predictions — invisible to the
    // buffer, served as NULL. Ordered by event_id (unique) so the
    // window frame is engine-deterministic.
    "q96_prediction_smooth" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        when(col("event_type") =!= "error", col("value") > 10.0).as("label"))
      graft.multimodal.PredictionBuffer
        .smoothWindow(e, "user_id", "event_id", "label")
        // harness parity: nullable BOOLEAN columns render their nulls
        // differently across the pandas bridge (None vs nan) — ship
        // INTs, whose nulls normalize identically on both engines
        .select(col("user_id"), col("event_id"),
          col("label").cast("int").as("label"),
          col("label_smoothed").cast("int").as("label_smoothed"))
        .orderBy(col("user_id"), col("event_id"))
    }),
    // W5/F20: date-spine generation + left join + coalesce default.
    "q24_date_spine" -> ((s, dir) => {
      val spine = s.range(1).select(explode(sequence(
        lit("2024-01-01").cast("date"), lit("2024-01-31").cast("date"),
        expr("INTERVAL 1 DAY"))).as("d"))
      val daily = t(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n_events"))
      spine.join(daily, Seq("d"), "left")
        .select(col("d").cast("timestamp").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy(col("day"))
    }),
    // lag/lead analytics: inter-event gap seconds per entity.
    "q25_event_gaps" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .select(col("event_id"), col("user_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))).as("gap_sec"))
        .orderBy(col("event_id"))
    }),
    // T2/W4: tumbling 5-minute capture window aggregation.
    "q26_tumbling_5min" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes").getField("start").as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bucket"), col("event_type"))
    }),
    // W4: round-to-capture-grid via Timestamps lib (10-minute grid).
    "q27_round_to_grid" -> ((s, dir) => {
      t(s, dir, "events")
        .select(Timestamps.roundToGrid(col("ts"), 10).as("grid_ts"))
        .groupBy(col("grid_ts")).agg(count(lit(1)).as("n"))
        .orderBy(col("grid_ts"))
    }),

    // Gap-based sessionization: new session when >30 min since the
    // previous event of the same user; session index via running sum.
    "q28_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(running))
        .select(col("event_id"), col("user_id"), col("session_seq"))
        .orderBy(col("event_id"))
    }),

    // P5/T3: freshness filter against a fixed capture tick.
    "q30_freshness" -> ((s, dir) => {
      Freshness.filter(t(s, dir, "events"),
          col("ts"), lit("2024-01-15 00:00:00").cast("timestamp"))
        .select(col("event_id"), col("ts"))
        .orderBy(col("event_id"))
    }),
    // P3: audited filter — single-pass kept/removed/critical counts.
    "q31_filter_audit" -> ((s, dir) => {
      t(s, dir, "events").agg(
        count(lit(1)).as("total"),
        count(when(col("event_type") =!= "error", 1)).as("kept"),
        count(when(col("event_type") === "error", 1)).as("removed"),
        count(when(col("event_type") === "error" && col("value") > 100, 1))
          .as("critical_removed"))
    }),
    // P7/A6: dedup by key subset → distinct key tuples.
    "q32_dedup_keys" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("user_id"), col("event_type")).distinct()
        .orderBy(col("user_id"), col("event_type"))
    }),
    // P4/F6: scrub + null-drop (nullif sentinel → na.drop).
    "q33_null_scrub" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("et", nullif(col("event_type"), lit("click")))
        .na.drop(Seq("et"))
        .select(col("event_id"), col("et"))
        .orderBy(col("event_id"))
    }),
    // T9: CDC-lite — keys in the new batch missing from staging.
    "q34_cdc_new_keys" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val cutoff = lit("1998-01-01").cast("timestamp")
      val staging = o.filter(col("o_orderdate") < cutoff)
        .select(concat_ws("|", col("o_custkey"), col("o_orderstatus")).as("ck"))
      val batch = o.filter(col("o_orderdate") >= cutoff)
        .withColumn("ck", concat_ws("|", col("o_custkey"), col("o_orderstatus")))
      batch.join(staging, Seq("ck"), "left_anti")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    }),
    // W2: latest-success scan — newest-first order, first NON-NULL
    // success id per entity (the reference walks capture timestamps
    // descending and returns the first materialized id:
    // rj_smtr/tasks.py:671-706). "Success" here = a non-error event.
    "q66_latest_success" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .withColumn("ok_id",
          when(col("event_type") =!= "error", col("event_id")))
        .select(col("user_id"),
          first(col("ok_id"), ignoreNulls = true).over(w).as("latest_success_id"))
        .distinct()
        .orderBy(col("user_id"))
    }),
    // T9/J4 inverse: SCD2 derivation — collapse an event history into
    // validity intervals per entity, one row per RUN of equal
    // event_type (value-change islands, vs q28's time-gap islands):
    // valid_from = run start (inclusive), valid_to = next run's start
    // (EXCLUSIVE — [from, to) half-open; NULL while current). A
    // q13-style fully-inclusive BETWEEN probe over these needs
    // `ts < valid_to`, not `<=`, or boundary timestamps double-match.
    "q86_scd2" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = t(s, dir, "events")
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(byUser).isNull ||
            lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(running))
        .groupBy(col("user_id"), col("run_id"), col("event_type"))
        .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      val nextFrom = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
      runs
        .withColumn("valid_to", lead(col("valid_from"), 1).over(nextFrom))
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("n_events"))
        // event_type completes the total order: two runs of one user can
        // share valid_from if distinct-type events land in the same
        // microsecond, and adjacent runs differ in type by construction
        .orderBy(col("user_id"), col("valid_from"), col("event_type"))
    }),
    // T2 variant: HOPPING (sliding) windows — 10-minute windows every
    // 5 minutes, each event contributing to exactly ⌈len/slide⌉ = 2
    // windows. Spark's window(ts, len, slide) expands rows scan-side
    // (a 2× Expand, no self-join) before the one aggregation shuffle.
    "q81_hopping_10m5m" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes")
          .getField("start").as("win_start"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("win_start"))
    }),
    // T2 variant: event-time SESSION windows via session_window — the
    // streaming-native gap sessionizer, batch-executed. One row per
    // (user, session) with bounds and totals; window end = last event
    // + gap. q28 derives per-event session indexes with lag+running-sum;
    // this is the whole-session aggregate Spark would maintain under a
    // watermarked streaming query with the exact same expression.
    "q76_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q20_topn" ->
      """SELECT event_id, ts FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 90""".stripMargin,
    "q21_keep_first" ->
      """SELECT user_id, first_event, first_ts FROM (
        |  SELECT user_id, event_id AS first_event, ts AS first_ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q22_running_sum" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q23_rolling_1h" ->
      """SELECT event_id, user_id,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id
        |    ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS rolling_1h
        |FROM events ORDER BY event_id""".stripMargin,
    "q96_prediction_smooth" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_type <> 'error' THEN value > 10.0 END AS label
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_id, label,
        |    (SUM(CAST(label AS INT)) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 2 > 3
        |      AS label_smoothed
        |  FROM e WHERE label IS NOT NULL)
        |SELECT user_id, event_id, CAST(label AS INT) AS label,
        |  CAST(label_smoothed AS INT) AS label_smoothed FROM p
        |UNION ALL
        |SELECT user_id, event_id, CAST(label AS INT) AS label,
        |  CAST(NULL AS INT) AS label_smoothed
        |FROM e WHERE label IS NULL
        |ORDER BY user_id, event_id""".stripMargin,
    "q24_date_spine" ->
      """WITH spine AS (
        |  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
        |    INTERVAL 1 DAY)) AS d),
        |daily AS (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT CAST(spine.d AS TIMESTAMP) AS day,
        |  COALESCE(daily.n_events, 0) AS n_events
        |FROM spine LEFT JOIN daily ON CAST(spine.d AS DATE) = daily.d
        |ORDER BY day""".stripMargin,
    "q25_event_gaps" ->
      """SELECT event_id, user_id,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) -
        |  CAST(epoch(date_trunc('second', lag(ts) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_sec
        |FROM events ORDER BY event_id""".stripMargin,
    "q26_tumbling_5min" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "q27_round_to_grid" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS grid_ts, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY grid_ts""".stripMargin,
    "q28_sessionize" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_seq
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           IS NULL
        |         OR CAST(epoch(date_trunc('second', ts)) AS BIGINT) -
        |            CAST(epoch(date_trunc('second',
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
        |              AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events)
        |ORDER BY event_id""".stripMargin,
    "q30_freshness" ->
      """SELECT event_id, ts FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 60 MINUTES
        |  AND ts <= TIMESTAMP '2024-01-15 00:00:00' + INTERVAL 20 SECONDS
        |ORDER BY event_id""".stripMargin,
    "q31_filter_audit" ->
      """SELECT COUNT(*) AS total,
        |  COUNT(CASE WHEN event_type <> 'error' THEN 1 END) AS kept,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS removed,
        |  COUNT(CASE WHEN event_type = 'error' AND value > 100 THEN 1 END)
        |    AS critical_removed
        |FROM events""".stripMargin,
    "q32_dedup_keys" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "q33_null_scrub" ->
      """SELECT event_id, nullif(event_type, 'click') AS et FROM events
        |WHERE nullif(event_type, 'click') IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q34_cdc_new_keys" ->
      """SELECT o_orderkey, o_custkey FROM orders b
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND NOT EXISTS (SELECT 1 FROM orders s
        |    WHERE s.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |      AND concat_ws('|', s.o_custkey, s.o_orderstatus) =
        |          concat_ws('|', b.o_custkey, b.o_orderstatus))
        |ORDER BY o_orderkey""".stripMargin,
    "q66_latest_success" ->
      """SELECT u.user_id,
        |  (SELECT e2.event_id FROM events e2
        |   WHERE e2.user_id = u.user_id AND e2.event_type <> 'error'
        |   ORDER BY e2.ts DESC, e2.event_id DESC LIMIT 1) AS latest_success_id
        |FROM (SELECT DISTINCT user_id FROM events) u
        |ORDER BY user_id""".stripMargin,
    "q86_scd2" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT user_id, event_type,
        |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id,
        |    ts
        |  FROM marked),
        |grouped AS (
        |  SELECT user_id, run_id, event_type,
        |    MIN(ts) AS valid_from, COUNT(*) AS n_events
        |  FROM runs GROUP BY user_id, run_id, event_type)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
        |    AS valid_to,
        |  n_events
        |FROM grouped
        |ORDER BY user_id, valid_from, event_type""".stripMargin,
    "q83_multi_horizon" -> {
      def acc(secs: Long, name: String) =
        s"""CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
           |    PARTITION BY user_id
           |    ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
           |    RANGE BETWEEN $secs PRECEDING AND CURRENT ROW) AS DOUBLE)
           |    AS $name""".stripMargin
      s"""SELECT event_id, user_id,
         |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec,
         |  ${acc(900, "acc_15min")},
         |  ${acc(3600, "acc_1h")},
         |  ${acc(14400, "acc_4h")},
         |  ${acc(86400, "acc_24h")}
         |FROM events ORDER BY event_id""".stripMargin
    },
    // Each event's two covering hop starts: its 5-minute bucket and the
    // one before (window length 10 = 2 slides).
    "q81_hopping_10m5m" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) - o.off AS win_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events, (SELECT unnest([INTERVAL '0 minutes',
        |  INTERVAL '5 minutes']) AS off) o
        |GROUP BY 1 ORDER BY win_start""".stripMargin,
    // Gaps-and-islands formulation of session_window: sessions coalesce
    // while an event lands within (or exactly on) 30 minutes of the
    // previous one — Spark merges the boundary-inclusive case (spec'd in
    // TransformsSpec) — so a session breaks only when the gap STRICTLY
    // exceeds the window; the session's end is last event + gap.
    "q76_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
  )
}
