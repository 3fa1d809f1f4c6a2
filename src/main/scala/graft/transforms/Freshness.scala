package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Freshness-window filtering (SURVEY §2.3 P5, §2.9 T3).
  *
  * The reference accepts GPS rows with
  * −20 s ≤ (capture_ts − event_ts) ≤ delay (1 min v1 / 60 min v2), and on
  * recapture additionally bounds the server-send delay to ≤ 6 min
  * (…onibus_gps/tasks.py:217-245, rj_smtr/constants.py:50-52).
  */
object Freshness {

  /** Keep rows whose event time lies within
    * [capture − delayMinutes, capture + clockSkewSeconds]. */
  def filter(df: DataFrame, eventTs: Column, captureTs: Column,
             delayMinutes: Int = 60, clockSkewSeconds: Int = 20): DataFrame =
    df.filter(
      eventTs >= captureTs - expr(s"INTERVAL $delayMinutes MINUTES") &&
      eventTs <= captureTs + expr(s"INTERVAL $clockSkewSeconds SECONDS"))

  /** Audit variant: tag rows instead of dropping, so the complement can be
    * counted in the same pass (P3-style audited filter). */
  def tag(eventTs: Column, captureTs: Column,
          delayMinutes: Int = 60, clockSkewSeconds: Int = 20): Column =
    eventTs >= captureTs - expr(s"INTERVAL $delayMinutes MINUTES") &&
      eventTs <= captureTs + expr(s"INTERVAL $clockSkewSeconds SECONDS")
}
