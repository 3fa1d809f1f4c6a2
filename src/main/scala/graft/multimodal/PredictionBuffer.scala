package graft.multimodal

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-entity prediction smoothing — the reference's Redis prediction
  * buffer (rj_escritorio/flooding_detection/utils.py:275-312,
  * tasks.py:377-391): each camera keeps its last `n` boolean labels
  * (seeded all-False), and the served label is the buffer's majority,
  * so one flaky vision call neither raises nor clears a flood alert.
  *
  * Reference semantics preserved exactly:
  *  - a NULL prediction is NOT added to the buffer and serves a NULL
  *    label (tasks.py:363-377 emits empty ai_classification);
  *  - an absent/short buffer pads with False on the old side;
  *  - majority over the n slots (for the default n=3 a tie cannot
  *    happen; for even n a tie serves False — deterministic, where
  *    Python's `max(set, key=count)` is insertion-order luck).
  *
  * Two engine shapes:
  *  - [[smoothWindow]] — batch/backfill over a (entity, ts, label)
  *    history: one Window over (entity, ts), no state table needed;
  *  - [[advance]] — tick-at-a-time over a persisted buffer state table
  *    (the Redis replacement, persisted via [[graft.state.StateStore]]/
  *    [[graft.lake.Lake]] like every other cross-run state here): one
  *    outer join per tick, O(batch ∪ state), no history rescan;
  *  - [[smoothStream]] — the same semantics as engine-managed
  *    Structured Streaming state (`flatMapGroupsWithState`,
  *    checkpointed buffers), for a live camera label stream.
  */
object PredictionBuffer {

  /** Batch smoothing: for every non-null prediction row, the majority
    * of the last `n` non-null labels of that entity up to and including
    * this row (older-than-history slots count as False, per the
    * reference's seeding). Null-label rows pass through with a null
    * smoothed label. Adds `smoothedCol`; one Window, one shuffle on the
    * entity key. */
  def smoothWindow(df: DataFrame, entityCol: String, tsCol: String,
                   labelCol: String, smoothedCol: String = "label_smoothed",
                   n: Int = 3): DataFrame = {
    require(n >= 1, s"buffer length must be positive, got $n")
    // null labels are invisible to the buffer: the window runs over the
    // NON-NULL subframe — a row-count frame over all rows would let a
    // failed prediction occupy a buffer slot ("last n ticks" instead of
    // the reference's "last n predictions")
    // secondary sort on the label: (entity, ts) SHOULD be unique (q96
    // orders by a unique event id), but if a caller feeds tied
    // timestamps the frame membership must still be run-deterministic
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(labelCol))
      .rowsBetween(-(n - 1), 0)
    val predicted = df.filter(col(labelCol).isNotNull)
      // absent slots (entity younger than n predictions) are False
      // seeds: the denominator is always n
      .withColumn(smoothedCol,
        sum(col(labelCol).cast("int")).over(w) * 2 > n)
    predicted.unionByName(
      df.filter(col(labelCol).isNull)
        .withColumn(smoothedCol, lit(null).cast("boolean")))
  }

  /** One serving tick: fold `batch` (one label per entity — latest
    * wins if duplicated, by `tsCol`) into the buffer state and return
    * (new state, served labels).
    *
    * `state`: (entity STRING, buffer ARRAY<BOOLEAN>) — pass an empty
    * frame on first run; persist the returned state with the caller's
    * atomic writer. Entities absent from the batch keep their buffer
    * (no decay — the reference only appends on a new prediction).
    * Served frame: (entity, label, label_smoothed) for batch rows;
    * null labels leave the buffer untouched and serve null. */
  def advance(state: DataFrame, batch: DataFrame, entityCol: String,
              tsCol: String, labelCol: String,
              n: Int = 3): (DataFrame, DataFrame) = {
    require(n >= 1, s"buffer length must be positive, got $n")
    val latest = batch
      // label as the tiebreaker: two frames stamped in the same second
      // must pick the SAME winner on every run/replan, or the buffer
      // (and whether the alert fires) becomes nondeterministic. NULLS
      // LAST and true-first: a real observation always beats a failed
      // attempt at the same instant, and ties err toward alerting
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(entityCol))
          .orderBy(col(tsCol).desc, col(labelCol).desc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(col(entityCol).cast("string").as("entity"),
        col(labelCol).cast("boolean").as("__label"),
        lit(true).as("__in_batch"))
    val joined = state.select(col("entity"), col("buffer"))
      .join(latest, Seq("entity"), "full_outer")
    // pad-left to n seeds, append, keep last n — utils.py:284-286
    // verbatim (an existing full buffer reduces to buffer.tail :+ label)
    val newBuffer = slice(concat(
      array_repeat(lit(false), n),
      coalesce(col("buffer"), array()),
      array(col("__label"))), -n, n)
    // entities with no prior buffer AND no (non-null) prediction this
    // tick get NO state row — the reference creates no Redis key for
    // them, and materializing seeded rows would grow state unboundedly
    // with failed-only entities (absent reads as seeded anyway)
    val nextState = joined
      .filter(col("__label").isNotNull || col("buffer").isNotNull)
      .select(col("entity"),
        when(col("__label").isNull, col("buffer")) // untouched
          .otherwise(newBuffer).as("buffer"))
    val served = joined.filter(col("__in_batch"))
      .select(col("entity"), col("__label").as("label"),
        when(col("__label").isNull, lit(null).cast("boolean")) // null serves null
          .otherwise(size(filter(newBuffer, x => x)) * 2 > n)
          .as("label_smoothed"))
    (nextState, served)
  }

  final case class Prediction(entity: String, ts: Timestamp,
                              label: Option[Boolean])
  final case class Smoothed(entity: String, ts: Timestamp,
                            label: Option[Boolean],
                            label_smoothed: Option[Boolean])

  /** Structured-Streaming variant: every prediction event is folded
    * into the entity's engine-checkpointed buffer (in event-time order
    * within each micro-batch) and served with its smoothed label —
    * [[advance]]'s semantics with the engine, not a lake table, owning
    * the state. Null labels serve null and leave the buffer untouched;
    * an entity that has only ever failed gets no state at all. Bounded
    * state: n booleans per entity, no timeout needed. */
  def smoothStream(ds: Dataset[Prediction], n: Int = 3): Dataset[Smoothed] = {
    require(n >= 1, s"buffer length must be positive, got $n")
    implicit val smoothedEnc = Encoders.product[Smoothed]
    implicit val bufEnc = Encoders.product[Tuple1[Seq[Boolean]]]
    ds.groupByKey(_.entity)(Encoders.STRING)
      .flatMapGroupsWithState[Tuple1[Seq[Boolean]], Smoothed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: String, rows: Iterator[Prediction],
         state: GroupState[Tuple1[Seq[Boolean]]]) =>
          var buf = state.getOption.map(_._1).getOrElse(Seq.fill(n)(false))
          var touched = false
          // label as tie-break (false < true after None): fold order of
          // same-instant events must not depend on shuffle arrival order
          val out = rows.toIndexedSeq
            .sortBy(p => (p.ts.getTime,
              p.label.map(l => if (l) 2 else 1).getOrElse(0)))
            .map { p =>
              p.label match {
                case Some(l) =>
                  touched = true
                  buf = (buf :+ l).takeRight(n)
                  Smoothed(entity, p.ts, p.label,
                    Some(buf.count(identity) * 2 > n))
                case None => Smoothed(entity, p.ts, None, None)
              }
            }
          if (touched) state.update(Tuple1(buf))
          out.iterator
      }
  }
}
