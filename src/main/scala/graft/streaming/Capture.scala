package graft.streaming

import java.sql.Timestamp

import graft.lake.{CaptureLog, Lake, TableRef}
import graft.transforms.{Clean, Nest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Micro-batch capture pipeline (SURVEY §3.2, §2.9 T1–T5).
  *
  * The reference's default_capture_flow per tick: fetch raw → save raw
  * verbatim → treat (stamp timestamp_captura, strip strings, nest to
  * pk+content) → staging append → `_logs` row
  * (rj_smtr/flows.py:46-194, rj_smtr/tasks.py:1403-1505).
  *
  * Spark shape: one Structured Streaming query per source with
  * `foreachBatch` doing raw append → treat → staging append → log append.
  * The checkpoint gives exactly-once batch tracking; the staging write
  * uses date/hora partitions so replays land idempotently (T5) — the
  * prefix-integrity + idempotent-sink recipe of Armbrust et al.,
  * "Structured Streaming: A Declarative API for Real-Time Applications
  * in Apache Spark" (SIGMOD 2018).
  */
final case class CaptureConfig(dataset: String, table: String,
                               pk: Seq[String], tsCol: String)

class Capture(spark: SparkSession, lake: Lake, log: CaptureLog,
              cfg: CaptureConfig) {

  /** Raw-zone write, idempotent per capture tick: the reference replaces
    * same-named raw files on re-upload (utils/dump_db/tasks.py:400-435),
    * and the Spark equivalent is a per-tick partition dynamically
    * overwritten — a retried tick (after a downstream failure marked its
    * log row failed) lands exactly once instead of appending duplicates. */
  private def writeRaw(stamped: DataFrame): Unit =
    lake.overwritePartitions(
      stamped
        .withColumn("data", date_format(col(cfg.tsCol), "yyyy-MM-dd"))
        .withColumn("tick",
          date_format(col("timestamp_captura"), "yyyyMMddHHmmss")),
      TableRef("raw", cfg.dataset, cfg.table), partitionBy = Seq("data", "tick"))

  /** The per-micro-batch body — usable directly for batch captures and
    * from foreachBatch for streaming ones. */
  def processBatch(raw: DataFrame, captureTs: Timestamp): Unit = {
    // The batch feeds TWO writes (raw + staging); cache it so the source
    // is scanned once per tick, not once per sink.
    val stamped = raw.withColumn("timestamp_captura", lit(captureTs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      writeRaw(stamped)

      val treated = Nest.toContent(
        Clean.trimStrings(stamped), pk = cfg.pk :+ "timestamp_captura")
        .withColumn("data", date_format(col("timestamp_captura"), "yyyy-MM-dd"))
        .withColumn("hora", date_format(col("timestamp_captura"), "HH"))
      lake.append(treated, TableRef("staging", cfg.dataset, cfg.table),
        partitionBy = Seq("data", "hora"))

      log.append(cfg.dataset, cfg.table, captureTs, success = true)
    } catch {
      case e: Exception =>
        log.append(cfg.dataset, cfg.table, captureTs, success = false,
          error = Some(e.getMessage))
        throw e
    } finally stamped.unpersist(blocking = false)
  }

  /** T4: execute a recapture backfill as ONE job, not one job per missed
    * minute: every window's rows are stamped with their own
    * timestamp_captura and unioned, so the raw append and the staging
    * append each run once over all windows (the partitioned writers land
    * every (data, hora) dir in that single pass — the
    * Trigger.AvailableNow shape of a batch backfill). Each recovered
    * minute still gets its own `[recapturado]` log row. */
  def processBackfill(windows: Seq[(Timestamp, DataFrame)]): Unit = {
    if (windows.isEmpty) return
    val union = windows.map { case (ts, df) =>
      df.withColumn("timestamp_captura", lit(ts))
    }.reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // per-tick overwrite: if this backfill is itself a retry (its
      // predecessor committed raw then failed on staging), the windows
      // replace their previous raw partitions instead of duplicating
      writeRaw(union)

      val treated = Nest.toContent(
        Clean.trimStrings(union), pk = cfg.pk :+ "timestamp_captura")
        .withColumn("data", date_format(col("timestamp_captura"), "yyyy-MM-dd"))
        .withColumn("hora", date_format(col("timestamp_captura"), "HH"))
      lake.append(treated, TableRef("staging", cfg.dataset, cfg.table),
        partitionBy = Seq("data", "hora"))

      windows.foreach { case (ts, _) =>
        log.append(cfg.dataset, cfg.table, ts, success = true,
          recaptured = true)
      }
    } catch {
      case e: Exception =>
        windows.foreach { case (ts, _) =>
          log.append(cfg.dataset, cfg.table, ts, success = false,
            error = Some(e.getMessage), recaptured = true)
        }
        throw e
    } finally union.unpersist(blocking = false)
  }

  /** T1: continuous capture from any streaming source. */
  def start(source: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ts = new Timestamp(System.currentTimeMillis())
        processBatch(batch, ts)
      }
      .start()
}
