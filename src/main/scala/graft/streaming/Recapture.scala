package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Late-data recovery planner (SURVEY §2.9 T4 — `query_logs`,
  * rj_smtr/tasks.py:437-558).
  *
  * Builds the minute spine over the lookback window, left-anti joins the
  * successful capture log minutes, and returns the missed minutes capped
  * at `maxRecaptures` (90 in the reference; overflow is the caller's
  * alert). The result feeds Trigger.AvailableNow backfill runs.
  */
object Recapture {

  final case class Plan(timestamps: Seq[Timestamp], overflowed: Boolean)

  /** Missed capture minutes in (now − lookbackDays, now], oldest first. */
  def plan(spark: SparkSession, logs: DataFrame, now: Timestamp,
           intervalMinutes: Int = 1, lookbackDays: Int = 1,
           maxRecaptures: Int = 90): Plan = {
    val step = intervalMinutes * 60
    val startSec = (now.getTime / 1000 - lookbackDays * 86400L) / step * step
    val spine = spark.range(1).select(explode(sequence(
      timestamp_seconds(lit(startSec)),
      lit(now),
      expr(s"INTERVAL $intervalMinutes MINUTES"))).as("minute"))
    val ok = logs.filter(col("sucesso") === true)
      .select(date_trunc("minute", col("timestamp_captura")).as("minute"))
      .distinct()
    val missed = spine.join(ok, Seq("minute"), "left_anti")
      .orderBy(col("minute"))
      .limit(maxRecaptures + 1)
      .collect().map(_.getTimestamp(0)).toIndexedSeq
    Plan(missed.take(maxRecaptures), overflowed = missed.size > maxRecaptures)
  }

  /** True when ANY capture minute in the lookback window is still
    * missing from the logs — the materialization gate's input
    * (rj_smtr/flows.py:225-236: `query_logs` over each source table →
    * `check_mapped_query_logs_output` → materialize only when False).
    * Existence check only: the spine anti-join stops at the first hole
    * (limit 1 under the hood), so gating a 1-minute tick costs one
    * small job, not a full plan.
    *
    * ORDERING CONTRACT (correctness, not convenience): within a tick the
    * scheduler must run capture for minute `now` BEFORE this gate, as the
    * reference's orchestration does — the spine deliberately includes
    * `now` because the materialization window ends at `now`. Gating only
    * on older minutes would NOT fix an out-of-order scheduler: a capture
    * for `now` landing after materialization writes rows the already-
    * advanced watermark never re-reads, and by the next tick the log
    * shows the minute present, so nothing would ever re-gate it. */
  def pending(spark: SparkSession, logs: DataFrame, now: Timestamp,
              intervalMinutes: Int = 1, lookbackDays: Int = 1): Boolean =
    plan(spark, logs, now, intervalMinutes, lookbackDays,
      maxRecaptures = 1).timestamps.nonEmpty

  /** Plan + execute in one call: the missed minutes are fetched through
    * `fetch` (the source's bounded window read) and land through
    * [[Capture.processBackfill]] as a single job. Returns the executed
    * plan so the caller can alert on overflow. */
  def backfill(spark: SparkSession, cap: Capture, logs: DataFrame,
               now: Timestamp, fetch: Timestamp => DataFrame,
               intervalMinutes: Int = 1, lookbackDays: Int = 1,
               maxRecaptures: Int = 90): Plan = {
    val p = plan(spark, logs, now, intervalMinutes, lookbackDays, maxRecaptures)
    cap.processBackfill(p.timestamps.map(ts => ts -> fetch(ts)))
    p
  }
}
