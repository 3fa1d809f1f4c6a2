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
  * those). [[categoricalDrift]] is the general machine — JSD between
  * two buckets' distributions of ANY categorical column:
  *  - token mix per source ([[tokenDistributionDrift]], q119);
  *  - language / source mix (`categoricalDrift(docs, key, "lang", …)`);
  *  - EMBEDDING-space drift without scoring a single vector:
  *    `categoricalDrift` over a dated IVF index's lists with
  *    `catCol = "cluster"` compares two days' coarse-cell occupancy —
  *    the quantizer's view of where the vectors moved (spec-pinned in
  *    LakeSpec; the recall-triggered retrain is the COST-gated signal,
  *    this is the cheap always-on one).
  */
object DriftOps {

  /** Per-key JSD between the `bucket` 0 and 1 distributions of
    * `catCol` — one row per key: (keyCol, n_a, n_b, jsd).
    *
    * Plan shape at 100 TB: one (key, category) count with map-side
    * combine (the wordcount shape — the only heavy shuffle, linear in
    * rows), a per-key totals rollup joined back BROADCAST (one row
    * per key), and a per-key sum of closed-form JSD terms. Nothing
    * pairwise, nothing driver-side.
    *
    * The JSD is rounded (`roundTo` dp, default 6) because it is a
    * floating SUM over categories — summation order differs across
    * engines/partitionings and the round absorbs it (the engine's
    * aggregate-output rounding convention). A key with an EMPTY side
    * yields NaN — JSD against a zero distribution is undefined, and
    * the guarded division matters: a source VANISHING from one day is
    * exactly the drift this monitor exists to catch, so it must
    * surface as a NaN row, not an ANSI divide-by-zero that kills the
    * whole job. Callers should treat NaN as maximal drift. */
  def categoricalDrift(rows: DataFrame, keyCol: String, catCol: String,
                       bucket: Column, roundTo: Int = 6): DataFrame =
    driftFromSideCounts(rows
      .select(col(keyCol), col(catCol).as("__cat"),
        bucket.cast("int").as("__half"))
      .groupBy(col(keyCol), col("__cat")).agg(
        sum(when(col("__half") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__half") === 1, 1L).otherwise(0L)).as("__cb")),
      keyCol, roundTo)

  /** [[categoricalDrift]] from two PRECOMPUTED count frames
    * (keyCol, catCol, nCol) — the incremental shape: a daily job
    * lands each day's vocab-sized histogram once
    * ([[tokenHistogram]]), and any two days compare WITHOUT
    * re-scanning text — O(vocab) instead of O(corpus), the same
    * retained-aggregate pattern as the mergeable HLL sketches. */
  def categoricalDriftFromCounts(a: DataFrame, b: DataFrame,
                                 keyCol: String, catCol: String,
                                 nCol: String, roundTo: Int = 6): DataFrame = {
    def tagged(df: DataFrame, asA: Boolean) = df.select(
      col(keyCol), col(catCol).as("__cat"),
      (if (asA) col(nCol) else lit(0L)).cast("long").as("__na"),
      (if (asA) lit(0L) else col(nCol)).cast("long").as("__nb"))
    driftFromSideCounts(
      tagged(a, asA = true).unionByName(tagged(b, asA = false))
        .groupBy(col(keyCol), col("__cat"))
        .agg(sum(col("__na")).as("__ca"), sum(col("__nb")).as("__cb")),
      keyCol, roundTo)
  }

  /** The shared JSD rollup over per-category side counts
    * (keyCol, __cat, __ca, __cb). */
  private def driftFromSideCounts(counts: DataFrame, keyCol: String,
                                  roundTo: Int): DataFrame = {
    val totals = counts.groupBy(col(keyCol)).agg(
      sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))
    // 0.5·p·log2(2p/(p+q)) summed over both sides; a category absent
    // from one side contributes only the other side's term (lim p→0 of
    // the term is 0, made explicit so no NaN leaks from log2(0))
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
      .agg(first(col("__ta")).as("n_a"), first(col("__tb")).as("n_b"),
        round(sum(side(col("__pa"), col("__pb"))
          + side(col("__pb"), col("__pa"))), roundTo).as("jsd"))
  }

  /** Zipf slope per key from a PRECOMPUTED (key, cat, n) histogram —
    * [[graft.functions.TextOps.zipfSlope]]'s ln-ln regression over
    * stored counts: O(vocab), no text re-scan, so a daily tick can
    * watch corpus SHAPE from the same landed histograms the JSD
    * reads. The two signals are complements: JSD sees distribution
    * CHANGE day-over-day, the slope sees UNNATURALNESS outright (a
    * templated feed is flat or cliffed from its first day — no
    * previous day needed to know that). Output
    * (keyCol, n_terms, zipf_slope); slope null under two distinct
    * categories. */
  def zipfSlopeFromCounts(counts: DataFrame, keyCol: String,
                          catCol: String, nCol: String,
                          topN: Int = 1000): DataFrame = {
    require(topN >= 2, s"topN must be >= 2: $topN")
    val W = org.apache.spark.sql.expressions.Window
    val ranked = counts
      .withColumn("__zs_rk", row_number().over(
        W.partitionBy(col(keyCol))
          .orderBy(col(nCol).desc, col(catCol).asc)))
      .filter(col("__zs_rk") <= topN)
      .select(col(keyCol),
        log(col("__zs_rk").cast("double")).as("__zs_x"),
        log(col(nCol).cast("double")).as("__zs_y"))
    ranked.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__zs_x")).as("__zs_sx"), sum(col("__zs_y")).as("__zs_sy"),
        sum(col("__zs_x") * col("__zs_y")).as("__zs_sxy"),
        sum(col("__zs_x") * col("__zs_x")).as("__zs_sxx"))
      .select(col(keyCol), col("n_terms"),
        round((col("n_terms") * col("__zs_sxy") -
            col("__zs_sx") * col("__zs_sy")) /
          nullif(col("n_terms") * col("__zs_sxx") -
            col("__zs_sx") * col("__zs_sx"), lit(0.0)),
          4).as("zipf_slope"))
  }

  /** (keyCol, tok, n) unigram histogram — the vocab-sized frame a
    * daily ingest LANDS so later drift checks never re-read the text
    * ([[categoricalDriftFromCounts]]). */
  def tokenHistogram(docs: DataFrame, keyCol: String,
                     textCol: String): DataFrame =
    docs.select(col(keyCol),
        explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col(keyCol), col("tok")).agg(count(lit(1)).as("n"))

  /** [[categoricalDrift]] over whitespace-tokenized `textCol` — JSD
    * between two days' unigram token distributions per key (q119's
    * operator). The explode is the only addition: tokens become the
    * categorical column, so the heavy shuffle stays the wordcount
    * shape, linear in tokens. */
  def tokenDistributionDrift(docs: DataFrame, keyCol: String,
                             textCol: String, bucket: Column,
                             roundTo: Int = 6): DataFrame = {
    val toks = docs
      .select(col(keyCol), bucket.cast("int").as("__halftok"),
        explode(split(col(textCol), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0)
    categoricalDrift(toks, keyCol, "__tok", col("__halftok"), roundTo)
      .withColumnRenamed("n_a", "n_tok_a")
      .withColumnRenamed("n_b", "n_tok_b")
  }
}
