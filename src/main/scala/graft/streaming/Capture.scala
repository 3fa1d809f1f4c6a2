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
  * `foreachBatch` doing raw land → treat → staging land → log append.
  * The checkpoint gives exactly-once batch tracking; BOTH zone writes
  * are per-tick dynamic partition OVERWRITES (raw on (data, tick),
  * staging on (data, hora, tick) — hour partitions are shared by ~60
  * ticks, so idempotency needs the tick level), and the streaming
  * path derives each batch's capture timestamp from a write-once state
  * file keyed by batchId, so a checkpoint REPLAY of the same batch
  * re-lands the identical partitions instead of duplicating — the
  * prefix-integrity + idempotent-sink recipe of Armbrust et al.,
  * "Structured Streaming: A Declarative API for Real-Time Applications
  * in Apache Spark" (SIGMOD 2018). (The first cut stamped wall-clock
  * time per attempt and APPENDED staging — a crash between the staging
  * land and the checkpoint commit duplicated rows; review-found.)
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
  /** Staging land, idempotent per tick: the hour partition is shared
    * by ~60 ticks, so an APPEND there cannot be replay-safe — the tick
    * sub-partition (derived from timestamp_captura, stable across
    * replays of the same batch) gives each capture its own overwrite
    * unit while (data, hora) readers see the union transparently. */
  private def writeStaging(treated: DataFrame): Unit =
    lake.overwritePartitions(
      treated.withColumn("tick",
        date_format(col("timestamp_captura"), "yyyyMMddHHmmss")),
      TableRef("staging", cfg.dataset, cfg.table),
      partitionBy = Seq("data", "hora", "tick"))

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
      writeStaging(treated)

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
      writeStaging(treated)

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

  /** Deterministic capture timestamp for a streaming batch: the FIRST
    * attempt records wall-clock time into a write-once file keyed by
    * batchId (atomic create-if-absent); a checkpoint replay reads the
    * SAME value back, so every partition the replay lands overwrites
    * its predecessor instead of duplicating under a fresh timestamp.
    * The tick files live beside the other state tables and are
    * tick-sized.
    *
    * Crash-atomicity (review-found): the value is written to a TEMP
    * file and committed by a NO-OVERWRITE rename
    * (`FileContext.rename` without `Options.Rename.OVERWRITE` —
    * atomic and dest-must-not-exist on HDFS and the local FS). A
    * crash mid-write leaves only a temp file, never an empty/partial
    * tick at the final path, AND a late racer's rename cannot replace
    * a tick another attempt already returned and landed partitions
    * under (a plain overwrite-rename lost that single-winner
    * property: racer A could read back t_A, land partitions, then
    * racer B's rename overwrote with t_B — two attempts of one
    * batchId with different ticks; review-found). The rename loser
    * deletes its temp and reads the winner.
    *
    * Defense in depth on the READ side: a ZERO-LENGTH tick (the one
    * state a legacy direct-create writer crash leaves at the final
    * path — this protocol's temps commit by rename, so a partial
    * never lands here) is treated as ABSENT — healed and re-created,
    * with a RE-READ before the delete (narrowing the heal/commit race
    * to two adjacent reads; a racer's commit between them survives).
    * A torn NON-EMPTY tick has no innocent producer, so it surfaces
    * LOUDLY instead of being silently re-minted — re-minting could
    * replace a tick another attempt already landed partitions under
    * (the r13/r14 residual TOCTOU, now closed for data-carrying
    * files: only empty files are ever deleted, and no committed tick
    * is empty). Reads
    * carry no exists() pre-check — a concurrent heal deleting the
    * file between exists and open would turn FileNotFoundException
    * into a micro-batch failure, so open's FileNotFoundException IS
    * the absent signal. Temps leaked by a crash between create and
    * rename are swept before any new mint (best-effort, ALL batchIds
    * — a same-batch-only sweep would never revisit an orphan younger
    * than its own batch's commit — and only temps OLDER than a minute
    * go: a live concurrent attempt holds its temp for milliseconds,
    * so the age guard keeps the sweep from deleting an in-flight
    * racer's file and starving both attempts; both review-found).
    * Stores with no FileContext binding fall
    * back to FileSystem.rename with read-back-the-winner — the
    * pre-hardening semantics, kept working rather than wedging the
    * stream on UnsupportedFileSystemException (review-found). */
  private[graft] def tickFor(batchId: Long): Timestamp = {
    import org.apache.hadoop.fs.{FileContext, Path}
    val hconf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(
      lake.path(TableRef("state", cfg.dataset, s"${cfg.table}_ticks")))
    val fs = dir.getFileSystem(hconf)
    val f = new Path(dir, batchId.toString)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // resolved ONCE: absence of an AbstractFileSystem binding is a
    // permanent property of the store, not a retryable race
    val fc: Option[FileContext] =
      try Some(FileContext.getFileContext(dir.toUri, hconf))
      catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None
      }
    // Some(content) = present; None = absent. No exists() pre-check —
    // see Scaladoc.
    def readOnce(): Option[String] =
      try {
        val in = fs.open(f)
        Some(try new String(in.readAllBytes(), utf8) finally in.close())
      } catch { case _: java.io.FileNotFoundException => None }
    // Plausibility-bounded: ticks are minted from currentTimeMillis, so
    // a committed tick is a 13-14 digit epoch (2001..5138). A PARTIAL
    // NUMERIC PREFIX left by a legacy direct-create crash ("1694" of
    // "1694012345678") would otherwise parse as a bogus ~1970 tick and
    // silently be accepted — the bound routes it to the same loud path
    // as non-numeric corruption (review-found).
    def parse(s: String): Option[Timestamp] =
      s.trim.toLongOption.filter(ms => ms >= 1000000000000L &&
        ms < 100000000000000L).map(ms => new Timestamp(ms))
    // Some(ts) = committed tick; None = absent (after healing an empty
    // file). Healing is restricted to ZERO-LENGTH files — the one state
    // a crashed writer actually leaves at the final path on a supported
    // store (a legacy direct-create that died before its write; this
    // protocol's own temps commit by rename, so a partial NEVER lands
    // here). A torn NON-EMPTY tick therefore has no innocent
    // explanation — silently re-minting it could replace a tick another
    // attempt already landed partitions under, so it surfaces LOUDLY
    // and an operator decides. This closes the r13/r14 heal-race
    // window for data-carrying files: only empty files are ever
    // deleted, and no committed tick is empty.
    def tryRead(): Option[Timestamp] = readOnce() match {
      case None => None
      case Some(s) => parse(s).orElse {
        if (s.nonEmpty)
          throw new java.io.IOException(
            s"tick file $f holds unparseable non-empty content " +
              s"(${s.length} bytes) — refusing to heal: no writer in " +
              "this protocol produces a torn committed tick, so this is " +
              "external corruption; inspect and remove the file manually")
        // empty: re-read before deleting (narrows the heal/commit race
        // to two adjacent reads; a racer's commit between them survives)
        readOnce() match {
          case Some(s2) if parse(s2).isDefined => parse(s2)
          case Some(s2) if s2.isEmpty => fs.delete(f, false); None
          case Some(s2) => throw new java.io.IOException(
            s"tick file $f holds unparseable non-empty content " +
              s"(${s2.length} bytes) — refusing to heal")
          case None => None
        }
      }
    }
    def acquire(attempts: Int): Timestamp = {
      if (attempts <= 0)
        throw new java.io.IOException(s"tick file $f: could not commit")
      tryRead().getOrElse {
        fs.mkdirs(dir)
        // sweep crash-orphaned temps of EVERY batchId — a temp younger
        // than its own batch's commit would never be revisited by a
        // same-batch sweep (the sweep only runs while a tick is absent,
        // and after the commit it never is again), so scoping the glob
        // per batchId leaked young orphans forever (review-found).
        // Age-guarded so a LIVE racer's in-flight temp (held for
        // milliseconds, any batchId) is never deleted.
        val now0 = System.currentTimeMillis()
        val stale = try fs.globStatus(new Path(dir, ".*.tmp"))
        catch { case _: java.io.IOException => Array.empty[org.apache.hadoop.fs.FileStatus] }
        Option(stale).getOrElse(Array.empty)
          .filter(st => now0 - st.getModificationTime > 60000L)
          .foreach { st =>
            try fs.delete(st.getPath, false)
            catch { case _: java.io.IOException => () }
          }
        val now = System.currentTimeMillis()
        val tmp = new Path(dir,
          s".$batchId.${java.util.UUID.randomUUID()}.tmp")
        val out = fs.create(tmp, true)
        try out.write(now.toString.getBytes(utf8))
        finally out.close()
        val won = fc match {
          // single-winner commit: atomic, fails if the destination exists
          case Some(c) =>
            try { c.rename(tmp, f); true }
            catch { case _: java.io.IOException => false }
          // no-FileContext store: plain rename + read-back-the-winner
          // (may overwrite on POSIX local — the weaker pre-hardening
          // contract, strictly better than wedging the stream)
          case None =>
            try fs.rename(tmp, f)
            catch { case _: java.io.IOException => false }
        }
        if (!won) {
          try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
        }
        acquire(attempts - 1)
      }
    }
    acquire(attempts = 5)
  }

  /** T1: continuous capture from any streaming source. The batch's
    * capture timestamp comes from [[tickFor]], so a checkpoint replay
    * of the same batchId re-lands identical partitions (T5). */
  def start(source: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, tickFor(batchId))
      }
      .start()
}
