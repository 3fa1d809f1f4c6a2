package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-entity watermark (SURVEY §2.9 T7 — the Redis hash
  * {station → last_update}, utils/utils.py:1013-1110 — as managed
  * streaming state).
  *
  * Batch pipelines use `StateStore.newerThanWatermark`/
  * `advanceEntityWatermarks`; streaming pipelines keep the same
  * keep-only-newer semantics in `flatMapGroupsWithState`, with state
  * checkpointed by the engine instead of a side store.
  */
object EntityWatermark {

  final case class Keyed(entity: String, ts: Timestamp)

  implicit private val tsEnc: Encoder[Timestamp] =
    Encoders.javaSerialization[Timestamp]

  /** Emit only rows strictly newer than the entity's running watermark;
    * advance the watermark to the max ts seen. Within one batch, rows
    * are compared against the PRE-batch watermark (reference semantics:
    * the Redis hash is read once per tick). */
  def filterNewer[T <: Keyed : Encoder](ds: Dataset[T]): Dataset[T] = {
    ds.groupByKey(_.entity)(Encoders.STRING)
      .flatMapGroupsWithState[Timestamp, T](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[T], state: GroupState[Timestamp]) =>
          val watermark = state.getOption
          val batch = rows.toIndexedSeq
          val fresh = watermark match {
            case Some(wm) => batch.filter(_.ts.after(wm))
            case None     => batch
          }
          if (fresh.nonEmpty) {
            val newMax = fresh.map(_.ts).maxBy(_.getTime)
            state.update(watermark.fold(newMax)(wm =>
              if (newMax.after(wm)) newMax else wm))
          }
          fresh.iterator
      }
  }
}
