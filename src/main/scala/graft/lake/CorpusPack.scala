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
  * Replay contract (Capture's write-then-advance, applied here):
  * [[assign]] is PURE — it reads the cursor but never advances it. The
  * caller lands the assigned batch, then calls [[commit]] with the
  * same frame. A run that dies between the two replays identically:
  * same cursor ⇒ same pack ids ⇒ idempotent overwrite of the landed
  * batch. Single-writer discipline per dataset (RunLock), as for all
  * state kinds.
  *
  * Equivalence guarantee (spec-proved): if batches arrive in document
  * order (ids monotone across batches — the capture case), then
  * assign∘commit per batch produces EXACTLY the pack ids q99's
  * one-shot window gives over the union.
  */
class CorpusPack(spark: SparkSession, state: StateStore, dataset: String,
                 budgetTokens: Long = 2048L) {
  require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")

  private val tableName = s"pack_cursor_$dataset"

  private def cursor(langCol: String): DataFrame =
    state.readTable(tableName, s"$langCol STRING, cum_tok BIGINT")

  /** Assign pack ids to a batch, continuing from the persisted
    * cursors. Output = batch columns + `pack_id`. Pure: state is read,
    * never written — see the replay contract above. */
  def assign(batch: DataFrame, langCol: String, idCol: String,
             nTokCol: String): DataFrame = {
    require(!batch.columns.contains("pack_id"),
      "pack_id is reserved by CorpusPack; drop or rename the input column")
    require(!batch.columns.contains("cum_tok"),
      "cum_tok is reserved by CorpusPack; drop or rename the input column")
    val w = Window.partitionBy(col(langCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    batch
      .join(broadcast(cursor(langCol)), Seq(langCol), "left")
      .withColumn("pack_id",
        floor((coalesce(col("cum_tok"), lit(0L)) +
          coalesce(sum(col(nTokCol)).over(w), lit(0L))) /
          lit(budgetTokens)))
      .drop("cum_tok")
  }

  /** Advance the per-language cursors by this batch's token totals.
    * Call AFTER the assigned batch has landed (write-then-advance). */
  def commit(batch: DataFrame, langCol: String, nTokCol: String): Unit = {
    val advanced = cursor(langCol).withColumnRenamed("cum_tok", "prev")
      .join(batch.groupBy(col(langCol))
        .agg(sum(col(nTokCol)).as("batch_tok")), Seq(langCol), "full")
      .select(col(langCol),
        (coalesce(col("prev"), lit(0L)) +
          coalesce(col("batch_tok"), lit(0L))).as("cum_tok"))
    state.writeTable(tableName, advanced)
  }
}
