package graft.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timestamp treatments (SURVEY §2.8 F8–F11, §1.2).
  *
  * The reference pins everything to America/Sao_Paulo
  * (rj_smtr/constants.py:15) and parses dual ISO formats with fallback
  * (br_rj_riodejaneiro_onibus_gps/tasks.py:97-104); epoch-millis GPS
  * stamps at tasks.py:209-213. We keep the session in UTC and convert
  * explicitly, so arithmetic is tz-stable on a cluster.
  */
object Timestamps {

  val LakeZone = "America/Sao_Paulo"

  /** F8: multi-format parse with fallback — first format that sticks wins. */
  def parseMulti(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** F9: epoch milliseconds → UTC timestamp. */
  def fromEpochMillis(c: Column): Column = timestamp_millis(c.cast("long"))

  /** F9: epoch millis → zone-local wall time (GPS datahora semantics). */
  def fromEpochMillisInZone(c: Column, zone: String = LakeZone): Column =
    from_utc_timestamp(timestamp_millis(c.cast("long")), zone)

  /** F10: partition-string formats used across the lake. */
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
  def hourStr(c: Column): Column = date_format(c, "HH")

  /** F11: subtract an interval given in minutes. */
  def minusMinutes(c: Column, minutes: Int): Column =
    c - expr(s"INTERVAL $minutes MINUTES")

  /** W4: round a timestamp down to an interval grid
    * (get_rounded_timestamp, rj_smtr/tasks.py:263-297). */
  def roundToGrid(c: Column, intervalMinutes: Int): Column =
    timestamp_seconds(
      (unix_timestamp(c) / (intervalMinutes * 60)).cast("long") * (intervalMinutes * 60))
}
