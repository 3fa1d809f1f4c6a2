package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus DRIFT monitoring — the day-over-day regression check a
  * rolling crawl ingest needs on top of dedup/quality gates (the
  * reference's per-run quality checks compare row counts and nulls;
  * a training corpus also needs its CONTENT distribution watched:
  * a crawler change that shifts the token mix shows up here days
  * before it shows up in model evals).
  *
  * The divergence is Jensen–Shannon (base 2, bounded [0, 1],
  * symmetric, defined for non-overlapping supports — KL is none of
  * those), over per-key unigram token distributions.
  */
object DriftOps {

  /** Per-key JSD between the token distributions of `bucket` 0 and 1
    * (e.g. yesterday vs today) — one row per key:
    * (keyCol, n_tok_a, n_tok_b, jsd).
    *
    * Plan shape at 100 TB: one explode → (key, token) count with
    * map-side combine (the wordcount shape — the only heavy shuffle,
    * linear in tokens), a per-key totals rollup joined back BROADCAST
    * (one row per key), and a per-key sum of closed-form JSD terms.
    * Nothing pairwise, nothing driver-side.
    *
    * The JSD is rounded (`roundTo` dp, default 6) because it is a
    * floating SUM over tokens — summation order differs across
    * engines/partitionings and the round absorbs it (the engine's
    * aggregate-output rounding convention). A key with an EMPTY side
    * yields NaN — JSD against a zero distribution is undefined, and
    * the guarded division matters: a source VANISHING from one day is
    * exactly the drift this monitor exists to catch, so it must
    * surface as a NaN row, not an ANSI divide-by-zero that kills the
    * whole job. Callers should treat NaN as maximal drift. */
  def tokenDistributionDrift(docs: DataFrame, keyCol: String,
                             textCol: String, bucket: Column,
                             roundTo: Int = 6): DataFrame = {
    val toks = docs
      .select(col(keyCol), bucket.cast("int").as("__half"),
        explode(split(col(textCol), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0)
    val counts = toks.groupBy(col(keyCol), col("__tok")).agg(
      sum(when(col("__half") === 0, 1L).otherwise(0L)).as("__ca"),
      sum(when(col("__half") === 1, 1L).otherwise(0L)).as("__cb"))
    val totals = counts.groupBy(col(keyCol)).agg(
      sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))
    // 0.5·p·log2(2p/(p+q)) summed over both sides; a token absent from
    // one side contributes only the other side's term (lim p→0 of the
    // term is 0, made explicit so no NaN leaks from log2(0))
    def side(p: Column, q: Column): Column =
      when(isnan(p) || isnan(q), lit(Double.NaN)) // empty side: NaN out
        .when(p > 0, p * log2(lit(2.0) * p / (p + q)) * 0.5)
        .otherwise(0.0)
    def share(c: Column, t: Column): Column =
      when(t > 0, c.cast("double") / t).otherwise(lit(Double.NaN))
    counts.join(broadcast(totals), Seq(keyCol))
      .select(col(keyCol), col("__ta"), col("__tb"),
        share(col("__ca"), col("__ta")).as("__pa"),
        share(col("__cb"), col("__tb")).as("__pb"))
      .groupBy(col(keyCol))
      .agg(first(col("__ta")).as("n_tok_a"), first(col("__tb")).as("n_tok_b"),
        round(sum(side(col("__pa"), col("__pb"))
          + side(col("__pb"), col("__pa"))), roundTo).as("jsd"))
  }
}
