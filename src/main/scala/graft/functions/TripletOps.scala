package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive-triplet mining — the training-data recipe for embedding
  * / reranker models (anchor, positive, negative): positives come from
  * a VERIFIED duplicate-pair graph the engine already mines (exact
  * cosine pairs, LSH near-dups, or the ANN-blocked scale path —
  * caller's choice of pair source), negatives from a SEEDED
  * pseudo-random pick over the whole corpus, made deterministic so the
  * mined set is identical on every engine, executor count and replay.
  *
  * Negative picking: every corpus id takes a 0-based rank in the
  * md5("seed:id") order ([[graft.core.GlobalOrder.rank0]] — the
  * sharded prefix-sum, no global sort), and an anchor at rank r draws
  * the id at rank (r + ⌊N/2⌋) mod N — the half-rotation of a random
  * permutation, i.e. a uniform-ish draw that can never self-pick for
  * N ≥ 2. The draw is NOT rejection-sampled (a retry loop would be a
  * driver-side iteration); instead each triplet carries the negative's
  * cosine and a `neg_clean` flag (below `negThreshold`, and not the
  * positive itself) so a consumer filters — at real corpus sizes the
  * dirty fraction is the corpus's duplicate density, i.e. tiny.
  *
  * Scale shape: one cosine join over the pair graph (linear in pairs),
  * one window per anchor group for best-positive, the sharded rank
  * (parallel windows + a 256-row rollup), one equi-join on rank for
  * the negative, two broadcast-or-shuffle hash joins to fetch vectors.
  * Nothing quadratic, nothing driver-side.
  */
object TripletOps {

  /** Mine (anchor_id, pos_id, pos_cos, neg_id, neg_cos, neg_clean)
    * from a verified pair graph. `pairs` must carry (id_a, id_b) with
    * id_a < id_b (any extra columns ignored); every id must exist in
    * `emb` — a pair id absent from `emb` fails the job loudly at
    * execution (scan-side `raise_error` riding `pos_cos`, the q113
    * idiom — no extra validation pass over either input). Each anchor
    * that appears in the graph yields ONE triplet: its best-cosine
    * positive (ties to the smaller id) and its seeded negative.
    * `neg_clean` = 1 when the negative's cosine is below
    * `negThreshold` and the draw is neither the anchor nor its
    * positive.
    *
    * The projected (id, vec, norm) frame is persisted
    * (MEMORY_AND_DISK) and materialized by the in-call corpus count,
    * so an expensive upstream `emb` plan (a decoded/scored frame) is
    * computed ONCE, not once per downstream join. The cache is
    * per-call and lives until the session evicts or clears it — a
    * returned lazy frame leaves no point where the callee could safely
    * release it. A long-lived driver mining MANY graphs in one session
    * should pass `persistVecs = false` (and persist/unpersist emb
    * itself around the calls) or clear between calls; one leaked
    * corpus projection per loop iteration is otherwise the cost. */
  def mineTriplets(emb: DataFrame, idCol: String, vecCol: String,
                   pairs: DataFrame, negThreshold: Double,
                   seed: String = "triplet-0",
                   persistVecs: Boolean = true): DataFrame = {
    val projected = emb.select(col(idCol).as("__tid"), col(vecCol).as("__tv"),
      VectorOps.norm(col(vecCol)).as("__tn"))
    val vecs = if (persistVecs)
      projected.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else projected
    // best positive per anchor: both orientations of the pair graph,
    // exact cosine, rank (score desc, candidate id asc)
    val bidir = pairs.select(col("id_a").as("anchor_id"),
        col("id_b").as("cand"))
      .union(pairs.select(col("id_b").as("anchor_id"),
        col("id_a").as("cand")))
    val scored = bidir
      .join(vecs.toDF("anchor_id", "__av", "__an"), Seq("anchor_id"), "left")
      .join(vecs.toDF("cand", "__cv", "__cn"), Seq("cand"), "left")
      .withColumn("pos_cos",
        // orphan guard rides pos_cos (evaluated for every pair row by
        // the best-positive ordering) so column pruning can't drop it:
        // a pair id with no emb row ⇒ raise_error at execution
        when(col("__an").isNull || col("__cn").isNull,
          raise_error(concat(
            lit("mineTriplets: pair id missing from emb -> ("),
            col("anchor_id").cast("string"), lit(", "),
            col("cand").cast("string"), lit(")"))).cast("double"))
          .otherwise(VectorOps.cosinePrenormed(
            col("__av"), col("__cv"), col("__an"), col("__cn"))))
    val wBest = Window.partitionBy(col("anchor_id"))
      .orderBy(col("pos_cos").desc, col("cand"))
    val best = scored
      .withColumn("__rk", row_number().over(wBest))
      .filter(col("__rk") === 1)
      .select(col("anchor_id"), col("cand").as("pos_id"), col("pos_cos"),
        col("__av"), col("__an"))
    // deterministic negative: global rank in the seeded md5 order,
    // half-rotation modulo the corpus size. Derived from the CACHED
    // projection, not emb, so the upstream plan isn't re-run.
    val keyed = vecs.select(col("__tid"))
      .withColumn("__key",
        md5(concat(lit(seed), lit(":"), col("__tid").cast("string"))))
    val ranked = graft.core.GlobalOrder
      .rank0(keyed, "__tid", "__key", "__rnk")
      .select(col("__tid"), col("__rnk"))
    val n = vecs.count() // materializes the persisted projection
    require(n >= 2, s"triplet mining needs >= 2 corpus rows, got $n")
    val anchors = best.join(
      ranked.toDF("anchor_id", "__arnk"), "anchor_id")
      .withColumn("__target", (col("__arnk") + lit(n / 2)) % lit(n))
    val negs = anchors.join(
        ranked.toDF("__nid", "__target"), Seq("__target"))
      .join(vecs.toDF("__nid", "__nv", "__nn"), "__nid")
      .withColumn("neg_cos", VectorOps.cosinePrenormed(
        col("__av"), col("__nv"), col("__an"), col("__nn")))
    negs.select(col("anchor_id"), col("pos_id"), col("pos_cos"),
      col("__nid").as("neg_id"), col("neg_cos"),
      (col("neg_cos") < negThreshold &&
        col("__nid") =!= col("anchor_id") &&
        col("__nid") =!= col("pos_id")).cast("int").as("neg_clean"))
  }
}
