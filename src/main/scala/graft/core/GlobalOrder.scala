package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix computations over a GLOBAL total order — the
  * primitive behind epoch-shuffled packing
  * ([[graft.lake.CorpusPack.epochShuffledPack]]) and deterministic
  * rank assignment ([[graft.functions.TripletOps]]).
  *
  * A naive global running total (`Window.orderBy` with no partition)
  * serializes the whole corpus through ONE task. Instead the order
  * key's first two characters shard the total order into CONTIGUOUS
  * ranges — ordering by the key IS ordering by (shard, rest) — so a
  * window within each shard runs parallel, the per-shard totals roll
  * up through one shard-count-row window (a bounded partition by
  * construction: ≤256 shards for hex keys), and the shard offsets
  * broadcast back. Same answer as the global window (spec-pinned by
  * exact comparison in PlansSpec), no global sort, no single-task
  * stage over the data.
  *
  * The key must distribute its first two characters roughly uniformly
  * for shard balance — md5-hex order keys (the engine's convention for
  * seeded pseudo-random orders) give 256 uniform shards. A skewed key
  * degrades parallelism, never correctness.
  */
object GlobalOrder {

  /** Append `outCol` = the running total of `valueCol` over all rows
    * STRICTLY BEFORE this one in the global (keyCol, idCol) order
    * (0 for the first row). All input columns pass through — including
    * null-keyed rows: a null key shards to "" (coalesce), which is
    * contiguous at the FRONT of the global order exactly where
    * ascending nulls-first ordering (Spark's default, and what the
    * equivalent single global window would do) places null keys, so
    * the sharded answer still equals the global window's. */
  def precedingSum(df: DataFrame, idCol: String, keyCol: String,
                   valueCol: String, outCol: String): DataFrame = {
    Seq("__go_shard", "__go_local", "__go_off", "__go_tot").foreach { c =>
      require(!df.columns.contains(c),
        s"$c is reserved by GlobalOrder; drop or rename the input column")
    }
    val sharded = df.withColumn("__go_shard",
      coalesce(substring(col(keyCol), 1, 2), lit("")))
    val wLocal = Window.partitionBy(col("__go_shard"))
      .orderBy(col(keyCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sharded.withColumn("__go_local",
      coalesce(sum(col(valueCol)).over(wLocal), lit(0L)))
    val wShard = Window.orderBy(col("__go_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(col("__go_shard"))
      .agg(sum(col(valueCol)).as("__go_tot"))
      .withColumn("__go_off",
        coalesce(sum(col("__go_tot")).over(wShard), lit(0L)))
      .select(col("__go_shard"), col("__go_off"))
    local.join(broadcast(offsets), Seq("__go_shard"))
      .withColumn(outCol, col("__go_off") + col("__go_local"))
      .drop("__go_shard", "__go_local", "__go_off")
  }

  /** Append `outCol` = this row's 0-based position in the global
    * (keyCol, idCol) order — [[precedingSum]] of the constant 1. */
  def rank0(df: DataFrame, idCol: String, keyCol: String,
            outCol: String): DataFrame = {
    require(!df.columns.contains("__go_one"),
      "__go_one is reserved by GlobalOrder; drop or rename the input column")
    precedingSum(df.withColumn("__go_one", lit(1L)), idCol, keyCol,
      "__go_one", outCol).drop("__go_one")
  }
}
