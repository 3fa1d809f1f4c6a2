package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  */
object StreamDedup {

  /** Exact streaming dedup by content hash within the watermark horizon.
    * Emits the first arrival of each content; later identical arrivals
    * within `horizon` of the watermark are dropped. State per key is one
    * 32-char hash + timestamp — a million docs/hour at a 2-hour horizon
    * is ~100 MB of store, executor-resident and checkpointed. */
  def exactWithinWatermark(stream: DataFrame, textCol: String, tsCol: String,
                           horizon: String): DataFrame =
    stream
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Keyed variant: dedup on explicit business keys (e.g. entity + tick)
    * instead of content — the reference's capture-id semantics. */
  def byKeysWithinWatermark(stream: DataFrame, keys: Seq[String], tsCol: String,
                            horizon: String): DataFrame =
    stream
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
