package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.lake.{Lake, TableRef}

/** Streaming deduplication (SURVEY §2.9 composed with the LLM-pipeline
  * dedup family — the continuous-ingestion counterpart of
  * [[graft.lake.CorpusDedup]]).
  *
  * A capture stream re-delivers content: at-least-once sources, retried
  * micro-batches, crawlers re-fetching a page. Exact dedup over the
  * stream is a content-hash + `dropDuplicatesWithinWatermark`: the
  * dedup state holds one hash per document seen within the watermark
  * horizon and is EVICTED as the watermark passes — bounded state, where
  * a plain `dropDuplicates` on an unbounded stream grows state forever
  * (the reference's capture dedup relies on the same bounded-window
  * assumption via its Redis key TTLs).
  *
  * Cross-horizon (forever) dedup belongs to the batch layer:
  * [[graft.lake.CorpusDedup]] anti-joins each landed micro-batch against
  * the bucketed corpus seen-set. Stream dedup keeps the hot path clean;
  * the lake keeps the corpus exact.
  *
  * Three stream-side drop rules, mirroring the batch dedup family:
  * exact content hash ([[exactWithinWatermark]]), MinHash-LSH text
  * bands ([[nearDupWithinWatermark]]), and cosine-over-embeddings
  * ([[semanticWithinWatermark]]). Landing is exactly-once via
  * [[landBatch]].
  */
object StreamDedup {

  /** Exact streaming dedup by content hash within the watermark horizon.
    * Emits the first arrival of each content; later identical arrivals
    * within `horizon` of the watermark are dropped. State per key is one
    * 32-char hash + timestamp — a million docs/hour at a 2-hour horizon
    * is ~100 MB of store, executor-resident and checkpointed. */
  def exactWithinWatermark(stream: DataFrame, textCol: String, tsCol: String,
                           horizon: String): DataFrame = {
    // same reserved-column guard as the batch twin (CorpusDedup.hashed):
    // withColumn would silently CLOBBER a caller's content_hash values
    require(!stream.columns.contains("content_hash"),
      "content_hash is reserved by exactWithinWatermark; drop or rename " +
        "the input column")
    stream
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** Keyed variant: dedup on explicit business keys (e.g. entity + tick)
    * instead of content — the reference's capture-id semantics. */
  def byKeysWithinWatermark(stream: DataFrame, keys: Seq[String], tsCol: String,
                            horizon: String): DataFrame =
    stream
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** NEAR-duplicate streaming dedup: MinHash-LSH band keys computed in
    * the scan projection ([[graft.functions.DedupOps.bandKeysPerRow]] —
    * no signature groupBy, so banding adds NO stateful operator), then
    * two watermark-bounded dedup stages:
    *
    *   1. band level — explode to one row per (band_idx, band_key) and
    *      `dropDuplicatesWithinWatermark`: a band already seen within the
    *      horizon is consumed by its first document;
    *   2. document level — one surviving band row re-emits its document
    *      (and re-deliveries of the same id are dropped exactly).
    *
    * A document is therefore dropped when EVERY one of its bands was
    * already claimed — the high-precision end of the LSH trade-off
    * (ANY-band matching is the batch candidate test; requiring all bands
    * keeps false drops rare on a stream where there is no Jaccard-verify
    * second chance). Two near-dups landing in the SAME micro-batch can
    * split their band claims and both pass — within-batch near-dup is
    * the landing pipeline's job ([[graft.functions.DedupOps
    * .dropNearDuplicates]] / [[graft.lake.CorpusDedup.novelNearDup]] in
    * foreachBatch), this operator bounds the cross-batch stream state.
    * State per band row is one md5 + timestamp, numBands rows per doc —
    * bounded by the horizon exactly like the exact variant.
    *
    * Documents shorter than one shingle get a per-document surrogate key
    * (never collides, so they always pass band dedup) and fall through
    * to the id-level stage. */
  def nearDupWithinWatermark(stream: DataFrame, idCol: String, textCol: String,
                             tsCol: String, horizon: String,
                             numHashes: Int = 8, rowsPerBand: Int = 2,
                             shingleSize: Int = 3): DataFrame = {
    val reserved = Seq("__bands", "band_idx", "band_key")
    val clash = stream.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"${clash.mkString(", ")} reserved by nearDupWithinWatermark")
    stream
      .withColumn("__bands", graft.functions.DedupOps.bandKeysPerRow(
        col(textCol), numHashes, rowsPerBand, shingleSize))
      .withWatermark(tsCol, horizon)
      .select(col("*"), posexplode_outer(col("__bands"))
        .as(Seq("band_idx", "band_key")))
      // shingle-less docs explode to a single null band: substitute a
      // key unique to the document so two of them never dedup each other
      .withColumn("band_idx", coalesce(col("band_idx"), lit(-1)))
      .withColumn("band_key", coalesce(col("band_key"),
        concat(lit("__noband|"), col(idCol).cast("string"))))
      .dropDuplicatesWithinWatermark("band_idx", "band_key")
      .dropDuplicatesWithinWatermark(idCol)
      .drop("__bands", "band_idx", "band_key")
  }

  /** One vector remembered by the semantic stream state (norm cached —
    * computed once at admission, not per comparison). */
  final case class SeenVec(id: Long, vec: Array[Float], norm: Double,
                           tsMs: Long)
  /** Per-bucket state: every vector admitted within the horizon. */
  final case class BucketSeen(entries: Seq[SeenVec])

  /** SEMANTIC (embedding) streaming dedup — SemDeDup's drop rule on the
    * ingest stream, completing the stream-side dedup family (exact
    * hash, LSH text bands, and now cosine-over-embeddings). A document
    * whose embedding is ≥ `threshold` cosine-similar to one already
    * admitted within the watermark horizon is dropped; the first
    * arrival of each semantic neighborhood passes.
    *
    * Blocking mirrors the batch path's q63 principle: vectors are
    * grouped by their `bits`-bit sign bucket ([[graft.functions
    * .VectorOps.signBucket]]) and only IN-BUCKET candidates are
    * cosine-verified — state and comparison cost are per-bucket, and a
    * near-dup pair split across buckets is the documented recall loss
    * (the batch layer's exact pass catches it downstream, same
    * defense-in-depth as [[nearDupWithinWatermark]]). Unlike the text
    * band operator, a bucket COLLISION alone never drops a document —
    * every drop is cosine-verified against the remembered vectors, so
    * false drops need actual similarity, not hash luck.
    *
    * State per bucket is the admitted vectors within the horizon
    * ((dim·4 + 16) bytes each), evicted by event-time timeout when the
    * watermark passes their horizon — bounded exactly like the
    * engine's other watermarked state. Batch-internal order is pinned
    * to (ts, id) so replays admit the same survivors. Input contract:
    * `idCol` long, `vecCol` array<float>, `tsCol` timestamp. Emits
    * (id, ts) of admitted documents; callers join payloads back by id
    * (the vector itself stays out of the output to keep the sink
    * narrow). Cosine is rounded to 4 dp — the engine's cross-run
    * determinism convention.
    *
    * MALFORMED EMBEDDINGS: by default a dimension mismatch between an
    * incoming vector and a remembered one fails the comparison loudly
    * (a truncated embedding scored against full-length norms can both
    * spuriously drop a novel doc and admit a true duplicate). Note the
    * failure mode: the batch aborts, the query fails, and — because
    * the poison row is still in the source — every RESTART replays it
    * and fails again, a permanent wedge until the row is purged
    * upstream. Streams that cannot guarantee the upstream schema pass
    * `expectedDim = Some(d)`: rows whose vector length ≠ d are
    * QUARANTINED — skipped (not admitted, not emitted, not stored),
    * counted in `quarantined` when supplied — so one corrupt record
    * costs one dropped row instead of the stream. With `expectedDim`
    * set, every stored vector has length d and the loud in-comparison
    * check becomes unreachable by construction. (The accumulator is a
    * MONITORING metric with Spark's at-least-once task-retry
    * semantics, not an exactly-once ledger.) */
  def semanticWithinWatermark(stream: DataFrame, idCol: String,
                              vecCol: String, tsCol: String, horizon: String,
                              threshold: Double, bits: Int = 4,
                              expectedDim: Option[Int] = None,
                              quarantined: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(horizon))
    require(iv.months == 0, s"horizon '$horizon' must not use months")
    val horizonMs = iv.days * 86400000L + iv.microseconds / 1000L
    def cos(a: Array[Float], na: Double, b: Array[Float], nb: Double): Double = {
      // a truncated/corrupt embedding must fail loudly, not score its
      // prefix against full-length norms (which can both spuriously
      // drop a novel doc and admit a true duplicate)
      require(a.length == b.length,
        s"embedding dimension mismatch: ${a.length} vs ${b.length}")
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      BigDecimal(d / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def norm(a: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    // the bucket projection itself indexes the first `bits` components
    // (element_at throws on a short vector under ANSI), so the
    // quarantine check must gate BEFORE it: mismatched rows take a
    // sentinel bucket — never evaluated through signBucket — and the
    // stateful function counts and drops them from that bucket
    val bucketCol = expectedDim match {
      case Some(d) =>
        when(size(col(vecCol)) === d,
            graft.functions.VectorOps.signBucket(col(vecCol), bits))
          .otherwise(lit("__dim_mismatch"))
      case None => graft.functions.VectorOps.signBucket(col(vecCol), bits)
    }
    stream
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        col(tsCol).cast("timestamp").as("ts"), bucketCol.as("bucket"))
      // AFTER the projection: a cast/rename re-derives the attribute
      // and would silently drop watermark metadata attached before it
      .withWatermark("ts", horizon)
      .as[(Long, Array[Float], java.sql.Timestamp, String)]
      .groupByKey(_._4)
      .flatMapGroupsWithState[BucketSeen, (Long, java.sql.Timestamp)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[BucketSeen]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var seen = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_.tsMs >= wm - horizonMs)
            val out = rows.toIndexedSeq
              .sortBy(r => (r._3.getTime, r._1))
              .flatMap { case (id, vec, ts, _) =>
                if (expectedDim.exists(_ != vec.length)) {
                  quarantined.foreach(_.add(1L)) // dead-letter, stream lives
                  None
                } else {
                  val nv = norm(vec)
                  val dup = nv > 0 && seen.exists(s =>
                    s.norm > 0 && cos(vec, nv, s.vec, s.norm) >= threshold)
                  if (dup) None
                  else {
                    seen = SeenVec(id, vec, nv, ts.getTime) +: seen
                    Some((id, ts))
                  }
                }
              }
            if (seen.nonEmpty) {
              state.update(BucketSeen(seen))
              // strictly above the watermark, or the engine rejects it
              state.setTimeoutTimestamp(
                math.max(wm + 1, seen.map(_.tsMs).max + horizonMs))
            } else state.remove()
            out.iterator
          }
      }
      .toDF("id", "ts")
      .withColumnRenamed("id", idCol).withColumnRenamed("ts", tsCol)
  }

  /** EXACTLY-ONCE land for `foreachBatch` compositions — the streaming
    * twin of [[graft.tools.DailyIngest]]'s land→commit invariant. The
    * micro-batch's novel frame lands as a DYNAMIC PARTITION OVERWRITE
    * keyed by the engine's batch id, never a blind append: foreachBatch
    * is at-least-once, so a crash between the land and the dedup-state
    * commit replays the whole batch — the replay recomputes the same
    * novel set (state unchanged) and the overwrite REPLACES the same
    * `batchCol = batchId` partition with identical rows, where an
    * append would re-append them. Post-commit replays overwrite the
    * partition with the recomputed (now empty-or-identical) novel set;
    * an empty frame touches no partition under dynamic overwrite, so
    * committed rows are never clobbered. Call order inside
    * foreachBatch: land → state commits, exactly like the batch path.
    *
    * The partition column it adds is physical layout, not payload —
    * readers that don't care simply never select it, and
    * [[graft.lake.Lake.compact]] folds old batch partitions into plain
    * files (the batch id becomes a data column) once those batches are
    * beyond every replayable checkpoint. */
  /** Streaming benchmark DECONTAMINATION — the continuous-ingestion
    * counterpart of [[graft.lake.CorpusDedup.decontamScrubSince]]:
    * spans around collisions with the registered test set strip from
    * each arriving document. Because the whole scrub is the fused
    * per-row kernel ([[graft.expressions.DecontamScrub]], test set as
    * a plan reference), the stage is a pure STATELESS projection — no
    * watermark, no state store, no stream-side shuffle, usable in any
    * output mode. The test-set snapshot is pinned when the query
    * STARTS (the plan reference serializes once); a newly registered
    * benchmark applies from the next query (re)start — the streaming
    * analog of the batch stage's strictly-before-day replay window.
    * Emits the input columns with `textCol` REWRITTEN plus `n_removed`;
    * docs scrubbed to nothing pass through empty for a downstream
    * filter to drop (a streaming stage must not silently change row
    * cardinality semantics mid-pipeline). */
  def decontamScrub(stream: DataFrame, textCol: String,
                    testShingles: Iterable[String], n: Int = 3,
                    margin: Int = 2): DataFrame = {
    require(!stream.columns.contains("n_removed"),
      "n_removed is reserved by decontamScrub; drop or rename the input column")
    val set = new graft.expressions.DecontamSet(
      testShingles.toArray.distinct.sorted)
    val st = graft.expressions.DecontamScrub.scrub(col(textCol), set, n, margin)
    stream.select(stream.columns.map(c =>
      if (c == textCol) st.getField("text_clean").as(textCol)
      else col(c)).toSeq :+ st.getField("n_removed").as("n_removed"): _*)
  }

  def landBatch(lake: Lake, ref: TableRef, novel: DataFrame, batchId: Long,
                batchCol: String = "ingest_batch"): Unit = {
    require(!novel.columns.contains(batchCol),
      s"column '$batchCol' reserved by landBatch; rename it or pass batchCol")
    lake.overwritePartitions(novel.withColumn(batchCol, lit(batchId)),
      ref, partitionBy = Seq(batchCol))
  }
}
