package graft.lake

import graft.state.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental greedy sequence packing across capture runs — the q99
  * operator composed with cross-run state (SURVEY §2.9 T6 + the
  * training-data packing step; reference precedent for the
  * state-advance ordering: the capture flows' write-then-advance
  * discipline, `streaming/Capture`).
  *
  * The 100 TB problem: pack ids must stay stable and DENSE over a
  * rolling ingest. Re-packing the whole corpus per batch is O(corpus),
  * and restarting ids at zero per batch breaks the "one pack id = one
  * training sequence" contract consumers rely on. The state that makes
  * packing incremental is tiny: a per-language CURSOR of tokens already
  * packed — a |langs|-row table kept in [[StateStore]] (inheriting its
  * atomic tmp→old swap and crash healing). Assigning a batch shuffles
  * only the batch (one window on the language key) and broadcasts the
  * cursor; the corpus never moves.
  *
  * Replay contract: every batch carries a caller-chosen `batchId` (the
  * capture run id). [[assign]] is PURE, and [[commit]] records the
  * batchId IN the cursor row alongside the advanced totals — one
  * atomic swap, so the marker and the totals can never disagree. That
  * closes BOTH crash windows of a land→commit cycle:
  *  - crash after land, before commit: cursor unchanged ⇒ replayed
  *    assign produces identical ids;
  *  - crash after commit, before the orchestrator records the batch
  *    as done: the cursor also keeps the PREVIOUS totals, so a
  *    replayed assign that presents the just-committed batchId packs
  *    against those — again identical ids — and the replayed commit
  *    is a no-op.
  * Single-writer discipline per dataset (RunLock), sequential batches,
  * as for all state kinds. One consumer contract follows from the
  * swap: an assigned frame binds LAZILY to the cursor files, so land
  * and fully materialize it BEFORE calling [[commit]] — executing it
  * afterwards reads swapped-out state files (a loud
  * FAILED_READ_FILE, never silent wrong ids).
  *
  * The one-shot-equivalence guarantee (batch-wise == q99 over the
  * union) requires document ids to be MONOTONE across batches — the
  * capture case. That precondition is ENFORCED, not assumed: the
  * cursor tracks each language's max packed id and [[assign]] plants a
  * `raise_error` on any row at or below it, so an out-of-order
  * backfill fails loudly instead of silently producing divergent
  * sequences.
  */
class CorpusPack(spark: SparkSession, state: StateStore, dataset: String,
                 budgetTokens: Long = 2048L) {
  require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")

  private val tableName = s"pack_cursor_$dataset"
  private val Schema =
    "lang STRING, cum_tok BIGINT, prev_tok BIGINT, " +
      "max_id BIGINT, prev_max_id BIGINT, batch STRING"

  private def cursor(): DataFrame = state.readTable(tableName, Schema)

  private def lastBatch(cur: DataFrame): Option[String] =
    cur.select(col("batch")).limit(1).collect().headOption.map(_.getString(0))

  /** The effective (lang, offset_tok, guard_id) frame for a batch:
    * normally the committed totals; for the batchId that was JUST
    * committed (crash-replay), the totals from before it. */
  private def offsets(batchId: String): DataFrame = {
    val cur = cursor()
    val replay = lastBatch(cur).contains(batchId)
    if (replay)
      cur.select(col("lang"), col("prev_tok").as("offset_tok"),
        col("prev_max_id").as("guard_id"))
    else
      cur.select(col("lang"), col("cum_tok").as("offset_tok"),
        col("max_id").as("guard_id"))
  }

  /** Assign pack ids to a batch, continuing from the persisted
    * cursors. Output = batch columns + `pack_id`. Pure: state is read,
    * never written — see the replay contract above. A batch row whose
    * id is ≤ the language's already-packed max fails the job loudly
    * (monotone-id precondition). */
  def assign(batch: DataFrame, langCol: String, idCol: String,
             nTokCol: String, batchId: String): DataFrame = {
    Seq("pack_id", "offset_tok", "guard_id", "__cum_tok").foreach { reserved =>
      require(!batch.columns.contains(reserved),
        s"$reserved is reserved by CorpusPack; drop or rename the input column")
    }
    val w = Window.partitionBy(col(langCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    batch
      .join(broadcast(offsets(batchId).withColumnRenamed("lang", langCol)),
        Seq(langCol), "left")
      .withColumn("__cum_tok",
        coalesce(col("offset_tok"), lit(0L)) +
          coalesce(sum(col(nTokCol)).over(w), lit(0L)))
      .withColumn("pack_id",
        // integral division on longs — exact at any cumulative total,
        // unlike the double-rounded floor(x / budget.toDouble)
        expr(s"__cum_tok div ${budgetTokens}L") +
          // the guard rides the pack_id expression so column pruning
          // can never drop it: violation ⇒ raise_error at execution
          when(col(idCol) <= coalesce(col("guard_id"),
              lit(Long.MinValue)),
            raise_error(concat(
              lit("CorpusPack: non-monotone id for incremental " +
                "packing (already packed past) -> "),
              col(idCol).cast("string"))).cast("long"))
            .otherwise(lit(0L)))
      .drop("offset_tok", "guard_id", "__cum_tok")
  }

  /** Advance the per-language cursors by this batch's token totals and
    * record `batchId` in the same atomic swap. Call AFTER the assigned
    * batch has landed (write-then-advance). Re-committing the recorded
    * batchId is a no-op — replay-idempotent. */
  def commit(batch: DataFrame, langCol: String, idCol: String,
             nTokCol: String, batchId: String): Unit = {
    val cur = cursor()
    if (lastBatch(cur).contains(batchId)) return // already committed
    val advanced = cur
      .select(col("lang"), col("cum_tok").as("prev"),
        col("max_id").as("prev_max"))
      .join(batch.groupBy(col(langCol).as("lang"))
        .agg(sum(col(nTokCol)).as("batch_tok"),
          max(col(idCol)).as("batch_max")), Seq("lang"), "full")
      .select(col("lang"),
        (coalesce(col("prev"), lit(0L)) +
          coalesce(col("batch_tok"), lit(0L))).as("cum_tok"),
        coalesce(col("prev"), lit(0L)).as("prev_tok"),
        greatest(coalesce(col("prev_max"), lit(Long.MinValue)),
          coalesce(col("batch_max"), lit(Long.MinValue))).as("max_id"),
        coalesce(col("prev_max"), lit(Long.MinValue)).as("prev_max_id"),
        lit(batchId).as("batch"))
    state.writeTable(tableName, advanced)
  }
}

/** One-shot packing recipes over a FROZEN corpus — the epoch-order
  * counterpart to the incremental class above. */
object CorpusPack {

  /** EPOCH-SHUFFLED sequence packing — shuffle-then-pack, the standard
    * recipe for a pretraining epoch's batch order: documents pack into
    * fixed `budgetTokens` greedy packs in a SEEDED pseudo-random global
    * order (md5 of "seed:id" — deterministic, so every engine, executor
    * count and replay derives the same epoch; a new `seed` is a new
    * epoch permutation).
    *
    * The global running total is computed WITHOUT a global sort —
    * [[graft.core.GlobalOrder.precedingSum]]'s sharded prefix-sum
    * (same answer as the global window, spec-pinned; no single-task
    * stage over the corpus).
    *
    * Returns (idCol, nTokCol, pack_id). Driver-visible as q121. */
  def epochShuffledPack(docs: DataFrame, idCol: String, nTokCol: String,
                        seed: String, budgetTokens: Long = 2048L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    Seq("__key", "__prev").foreach { c =>
      require(!docs.columns.contains(c),
        s"$c is reserved by epochShuffledPack; drop or rename the input column")
    }
    val seeded = docs.withColumn("__key",
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
    graft.core.GlobalOrder
      .precedingSum(seeded, idCol, "__key", nTokCol, "__prev")
      .select(col(idCol), col(nTokCol),
        // integral division (IntegralDivide) on longs — exact at every
        // scale, no power-of-two-budget caveat; __prev is a sum of
        // non-negative token counts so truncation == floor
        expr(s"__prev div ${budgetTokens}L").as("pack_id"))
  }

  /** In-Context Pretraining packing (Shi et al. 2023; driver-visible as
    * q152): instead of [[epochShuffledPack]]'s random epoch permutation,
    * order documents by [[graft.functions.VectorOps.icpOrder]]'s
    * similarity chains and pack CONSECUTIVE documents into fixed
    * `budgetTokens` contexts — so a context window holds semantically
    * related neighbors rather than random ones. Same sharded prefix-sum
    * (no global single-task sort); the order key is the chain's
    * global_pos, zero-padded so the prefix shards order consistently
    * with the numeric key.
    *
    * `embeddings(embIdCol)` must cover every doc id — the join is inner
    * (a doc without an embedding cannot be placed on a chain), so
    * callers align the two frames first; the engine's ingest does (the
    * ANN leg's embedding-column contract).
    *
    * Returns (idCol, global_pos, nTokCol, pack_id). */
  def icpPack(docs: DataFrame, idCol: String, nTokCol: String,
              embeddings: DataFrame, embIdCol: String, labelCol: String,
              vecCol: String, budgetTokens: Long = 2048L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val ord = graft.functions.VectorOps
      .icpOrder(embeddings, embIdCol, labelCol, vecCol)
      .select(col(embIdCol).as("__icp_id"), col("global_pos"))
    val joined = docs.select(col(idCol), col(nTokCol))
      .join(ord, col(idCol) === col("__icp_id"))
      .select(col(idCol), col("global_pos"), col(nTokCol),
        lpad(col("global_pos").cast("string"), 12, "0").as("__gp"))
    graft.core.GlobalOrder
      .precedingSum(joined, idCol, "__gp", nTokCol, "__prev")
      .select(col(idCol), col("global_pos"), col(nTokCol),
        expr(s"__prev div ${budgetTokens}L").as("pack_id"))
  }
}
