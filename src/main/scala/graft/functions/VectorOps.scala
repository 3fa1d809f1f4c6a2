package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity operators: brute-force cosine top-k (baseline),
  * sign-bucket LSH pruning and IVF centroids (the scale path; candidate
  * pruning before exact scoring follows the incremental top-k-search
  * framing of EDBT 2020's interactive similarity-search work).
  *
  * Element-wise math is done with zip_with/aggregate over array<float>
  * columns, widening to double BEFORE the multiply so every product is a
  * deterministic double (portable vs the DuckDB oracle); only the final
  * summation order varies, absorbed by round(…, 4).
  *
  * At 100 TB: brute-force is one broadcast of the query vector + a single
  * scan with TakeOrderedAndProject (no full sort, no shuffle of the data);
  * the LSH/IVF variants prune the scan by bucket equi-join so the
  * candidate set, not the corpus, is scored.
  */
object VectorOps {

  /** Driver-side seeding sample rows for farthest-first — a CONSTANT,
    * independent of both k and the corpus size. */
  private[graft] val SeedSampleN = 2000

  /** Largest k that seeds via the farthest-first spread pass; above it
    * [[kmeansLloyd]] switches to distributed hash seeding (the k
    * smallest-md5 vectors), because O(SeedSampleN·k) driver arg-max
    * work must not ride k ∝ n. */
  private[graft] val FarthestFirstMaxK = 256

  /** Largest k at which [[scoredArr]]'s unrolled-structs TEST-ORACLE
    * shape is built (one codegen'd struct per centroid — plan size
    * O(k·dim) expressions, unusable at k ∝ n). Production assignment
    * runs the fused [[graft.expressions.NearestCentroid]] kernel at
    * EVERY k since the round-10 A/B (MicroBench: the kernel beats the
    * unrolled shape ~3× even at k = 128 — flat primitive centroid
    * array vs per-centroid ArrayData literals — and the retired
    * interpreted `transform` shape 6–16× at k = 2048); the constant
    * only bounds where the oracle shapes stay cheap enough to build. */
  private[graft] val LiteralCentroidMaxK = 128

  /** Rows the driver samples to seed k clusters — O(k) at worst, never
    * O(n) (callers set k, e.g. q114's k = n/500; the per-k sample
    * multiplier that made this n/10 is gone). */
  private[graft] def seedSampleN(k: Int): Int =
    if (k <= FarthestFirstMaxK) math.max(SeedSampleN, k) else k

  /** Σ aᵢ·bᵢ with double widening per element — native codegen'd
    * expression (see [[graft.expressions.VecDot]]); semantically equal to
    * aggregate(zip_with(a, b, (x, y) => x.double * y.double), 0.0, _+_)
    * but runs as a primitive loop inside whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VecDot.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 4 dp (cross-engine deterministic). */
  def cosine(a: Column, b: Column): Column = round(dot(a, b) / (norm(a) * norm(b)), 4)

  /** Cosine from precomputed norms — higher-order functions are
    * interpreted (CodegenFallback), so evaluating norm once per ROW
    * instead of once per PAIR is a 3× cut on the hot path. */
  def cosinePrenormed(a: Column, b: Column, na: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb), 4)

  /** Brute-force top-k most-similar rows to one query vector.
    * queryVec is broadcast (a one-row frame crossJoined in); norms are
    * computed once per side before the join. */
  def bruteForceTopK(corpus: DataFrame, queryVec: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queryVec.select(col(vecCol).as("__qv"), norm(col(vecCol)).as("__qn"))
    corpus.withColumn("__n", norm(col(vecCol)))
      .crossJoin(broadcast(q))
      .select(col(idCol),
        cosinePrenormed(col(vecCol), col("__qv"), col("__n"), col("__qn")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Random-hyperplane-style LSH bucket from the signs of the first
    * `bits` components (the testdata embeddings are isotropic, so
    * coordinate signs behave as hyperplane signs). */
  def signBucket(vec: Column, bits: Int = 4): Column =
    concat((1 to bits).map(i =>
      when(element_at(vec, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** LSH-pruned top-k: score only corpus rows in the query's sign bucket. */
  def lshTopK(corpus: DataFrame, queryVec: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 4): DataFrame = {
    val q = queryVec.select(col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"),
      signBucket(col(vecCol), bits).as("__bucket"))
    corpus.withColumn("__bucket", signBucket(col(vecCol), bits))
      .join(broadcast(q), Seq("__bucket"))
      .select(col(idCol),
        cosinePrenormed(col(vecCol), col("__qv"), norm(col(vecCol)), col("__qn"))
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Lloyd's k-means training for the IVF coarse quantizer — the trained
    * upgrade of [[centroids]]' per-label means. Deterministic: seeds are
    * the k vectors with the smallest md5 of their rendered text (stable
    * across runs and partitionings — no rand()). Per iteration the
    * ASSIGNMENT is k codegen'd [[graft.expressions.VecDot]] scorings
    * against literal broadcast centroids (zero joins, zero shuffles of
    * the corpus) and the RECOMPUTE is one (cluster, dim) groupBy whose
    * shuffle carries k·dim partial sums; centroids collect per round —
    * k·dim doubles, driver-bounded, the same shape MLlib uses. Returns
    * (cluster, pos, centroid) rows, [[ivfTopKPrebuilt]]'s cents shape. */
  def kmeansLloyd(corpus: DataFrame, vecCol: String, k: Int,
                  iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def vecOf(r: org.apache.spark.sql.Row): Array[Double] =
      r.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue).toArray
    // Deterministic seeding, CONSTANT driver cost in the corpus size.
    //
    // k ≤ FarthestFirstMaxK — farthest-first (k-means++ flavor without
    // rand()): first seed = smallest md5 of the rendered vector; each
    // next seed maximizes its min distance to the chosen seeds, md5 as
    // the tie-break, over a FIXED SeedSampleN-row smallest-md5 sample (a
    // uniform draw, and a superset of every corpus ≤ SeedSampleN, so
    // small-corpus seeds are bit-identical to the unsampled algorithm).
    // Smallest-hash-only seeding can draw every seed from one dense
    // cluster and Lloyd cannot recover from that; the sample pins
    // seeding at one TakeOrdered job and ≤ SeedSampleN·k driver
    // distance evaluations — both independent of n.
    //
    // k > FarthestFirstMaxK (the k ∝ n regime, e.g. SemDeDup's
    // k = n/500) — DISTRIBUTED hash seeding: the seeds are simply the k
    // smallest-md5 vectors, one TakeOrdered job of k rows. The md5
    // order is corpus-wide uniform, so with thousands of seeds the draw
    // covers the space without the farthest-first spread pass — whose
    // O(sample·k) driver arg-max is exactly what must NOT grow once
    // k ∝ n (an earlier revision sampled 50·k rows = n/10 and spent
    // ~n²/5000 driver FLOPs here). Any residual seeding noise is
    // corrected by the full-corpus Lloyd iterations. The O(k·dim)
    // driver memory that remains is the centroid table itself —
    // irreducible for a k-centroid quantizer (centroidArrays collects
    // the same k·dim doubles on every consumer).
    val sampleN = seedSampleN(k)
    // The loop below scans the training vectors once per iteration plus
    // the seeding pass — cache the COLUMN-PRUNED working set for the
    // training's duration (MLlib's own k-means practice) so iterations
    // read blocks, not source files. Bounded by the TRAINING input the
    // caller chose: the SemDeDup/retrain paths pass a ~10% hash sample,
    // and build-time full-corpus training is the one place the whole
    // vector column justifies a disk-backed cache.
    val work = corpus.select(col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val hashed = work.withColumn("h", md5(concat_ws(",", col(vecCol))))
    val sampled = hashed.orderBy(col("h"))
      .select(col(vecCol), col("h")).take(sampleN)
    require(sampled.nonEmpty,
      "k-means training corpus is empty — nothing to seed the quantizer from")
    val sVecs = sampled.map(vecOf)
    val sHash = sampled.map(_.getString(1))
    def sqDistLocal(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var cents: IndexedSeq[Array[Double]] =
      if (k > FarthestFirstMaxK) sVecs.toIndexedSeq // already md5-ordered
      else {
        val minD = Array.fill(sVecs.length)(Double.MaxValue)
        var acc: IndexedSeq[Array[Double]] = IndexedSeq(sVecs.head) // min md5
        while (acc.size < k) {
          var best = -1; var bestD = -1.0; var bestH = ""
          var i = 0
          while (i < sVecs.length) {
            val d = sqDistLocal(sVecs(i), acc.last)
            if (d < minD(i)) minD(i) = d
            if (minD(i) > bestD ||
                (minD(i) == bestD && (best == -1 || sHash(i) < bestH))) {
              best = i; bestD = minD(i); bestH = sHash(i)
            }
            i += 1
          }
          acc = acc :+ sVecs(best)
        }
        acc
      }

    var it = 0
    while (it < iters) {
      // round(…, 4) on the aggregation output, per the engine's
      // determinism convention: an unrounded avg depends on partial-sum
      // ORDER, so the same corpus trained on 4 vs 32 threads produced
      // slightly different quantizers — and every downstream recall
      // number drifted with the environment. Rounded centroids make
      // index builds reproducible across cluster sizes.
      val next = assignClusters(work, cents, vecCol)
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("x").cast("double")), 4).as("centroid"))
        .collect()
      val byCluster = next.groupBy(_.getInt(0))
      // a cluster that lost every member keeps its old centroid
      cents = cents.indices.map { c =>
        byCluster.get(c).map { rows =>
          val arr = new Array[Double](cents(c).length)
          rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          arr
        }.getOrElse(cents(c))
      }
      it += 1
    }
    cents.zipWithIndex.flatMap { case (cvec, c) =>
      cvec.zipWithIndex.map { case (v, p) => (c, p, v) }
    }.toDF("cluster", "pos", "centroid")
    } finally work.unpersist(blocking = false)
  }

  /** |v−c|² minus the per-row |v|² constant, for one literal centroid —
    * |c|² − 2·v·c via one codegen'd dot product. */
  private def sqDistRel(cvec: Array[Double], vec: Column): Column =
    lit(cvec.map(x => x * x).sum) -
      lit(2.0) * graft.expressions.VecDot.vec_dot(vec, lit(cvec))

  /** array<struct<d: squared-L2-minus-|v|², c: cluster id>> — one entry
    * per centroid, min/sort order = (distance, cluster id). TEST
    * ORACLES ONLY since round 10: production assignment is the fused
    * [[graft.expressions.NearestCentroid]] kernel at every k.
    *
    * `forceArrayPath = false` (k ≤ [[LiteralCentroidMaxK]]): k unrolled
    * codegen'd [[sqDistRel]] structs. `forceArrayPath = true`: the
    * retired k-unbounded shape — centroids as ONE `typedLit` array
    * (plus a precomputed |c|² array) scored by `transform`, whose
    * lambda runs [[graft.expressions.VecDot]]'s interpreted eval per
    * element. Both share the kernel's arithmetic (n2 − 2·dot, same
    * summation order) with ZERO shared code — the drift alarms the
    * parity specs ring. */
  private[graft] def scoredArr(cents: Seq[Array[Double]], vec: Column,
                               forceArrayPath: Boolean = false): Column =
    if (!forceArrayPath && cents.size <= LiteralCentroidMaxK)
      array(cents.zipWithIndex.map { case (cvec, i) =>
        struct(sqDistRel(cvec, vec).as("d"), lit(i).as("c"))
      }: _*)
    else {
      val cArr = typedLit(cents.map(_.toSeq))
      val n2Arr = typedLit(cents.map(c => c.map(x => x * x).sum))
      transform(cArr, (cv, i) => struct(
        (element_at(n2Arr, i + lit(1)) - lit(2.0) *
          graft.expressions.VecDot.vec_dot(vec, cv)).as("d"),
        i.as("c")))
    }

  /** Nearest trained centroid per row (adds `cluster`). Ranking is by
    * squared L2 minus the per-row |v|² constant (|c|² − 2·v·c), k dot
    * products per row — no join, no shuffle, ONE fused codegen'd
    * kernel node ([[graft.expressions.NearestCentroid]]) at every k,
    * so plan size never rides k and the dot products run as a
    * primitive loop over a flat centroid array (spec-pinned row parity
    * against both [[scoredArr]] oracle shapes). Ties break to the
    * smaller cluster id (deterministic). */
  def assignClusters(corpus: DataFrame, cents: Seq[Array[Double]],
                     vecCol: String): DataFrame =
    assignClustersImpl(corpus, cents, vecCol, forceArrayPath = false)

  private[graft] def assignClustersImpl(corpus: DataFrame,
      cents: Seq[Array[Double]], vecCol: String,
      forceArrayPath: Boolean): DataFrame =
    corpus.withColumn("cluster",
      if (forceArrayPath)
        array_min(scoredArr(cents, col(vecCol), forceArrayPath = true))
          .getField("c")
      else
        graft.expressions.NearestCentroid.nearest_centroid(col(vecCol), cents))

  /** Each row's `nAssign` nearest centroids, EXPLODED to one row per
    * (vector, cluster) — multi-probe blocking for candidate-pair
    * generation: a near-dup pair the quantizer splits across two cells
    * still collides in a shared second-choice cell. Blocking cost is a
    * constant ×nAssign on rows (×nAssign² on worst-case pairs), not a
    * growth term. Same two plan shapes and tie-break as
    * [[assignClusters]]. */
  def assignClustersMulti(corpus: DataFrame, cents: Seq[Array[Double]],
                          vecCol: String, nAssign: Int): DataFrame =
    assignClustersMultiImpl(corpus, cents, vecCol, nAssign,
      forceArrayPath = false)

  private[graft] def assignClustersMultiImpl(corpus: DataFrame,
      cents: Seq[Array[Double]], vecCol: String, nAssign: Int,
      forceArrayPath: Boolean): DataFrame =
    corpus.withColumn("cluster",
      if (forceArrayPath)
        explode(slice(sort_array(scoredArr(cents, col(vecCol),
          forceArrayPath = true)), 1, nAssign).getField("c"))
      else
        explode(graft.expressions.NearestCentroid
          .nearest_centroids(col(vecCol), cents, nAssign)))

  /** (cluster, pos|dim, centroid) rows → dense arrays indexed by
    * cluster — k×dims doubles, the bounded collect every IVF consumer
    * does before the codegen'd assignment pass. Requires a row for
    * every cluster in 0..max (kmeansLloyd guarantees it: an emptied
    * cluster keeps its previous centroid). */
  def centroidArrays(cents: DataFrame, posCol: String = "pos"): IndexedSeq[Array[Double]] = {
    val rows = cents.select(col("cluster"), col(posCol), col("centroid")).collect()
    val byCluster = rows.groupBy(_.getInt(0))
    require(byCluster.nonEmpty, "empty centroid table")
    (0 to byCluster.keys.max).map { c =>
      val cr = byCluster.getOrElse(c,
        throw new IllegalStateException(s"centroid table missing cluster $c"))
      val arr = new Array[Double](cr.length)
      cr.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
      arr
    }
  }

  /** IVF coarse quantizer build: per-partition (label) centroid, one row
    * per (partition, dimension). posexplode keeps it fully distributed.
    * Centroids are rounded to 4 dp so downstream distances are computed
    * from cross-engine-identical inputs. */
  def centroids(corpus: DataFrame, partCol: String, vecCol: String): DataFrame =
    corpus.select(col(partCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(partCol), col("dim"))
      .agg(round(avg(col("x").cast("double")), 4).as("centroid"))

  /** IVF search: rank inverted lists by query↔centroid cosine, probe only
    * the top `nprobe`, exact-score inside them. At 100 TB the centroid
    * table is tiny (nlists × dims) and both it and the probe set
    * broadcast; the corpus join prunes the scan to nprobe/nlists of the
    * data BEFORE any scoring — the recall/cost dial every IVF index
    * exposes, with brute force as the nprobe = nlists limit. */
  def ivfTopK(corpus: DataFrame, queryVec: DataFrame, idCol: String,
              partCol: String, vecCol: String, k: Int,
              nprobe: Int = 2): DataFrame =
    ivfTopKPrebuilt(corpus, centroids(corpus, partCol, vecCol), queryVec,
      idCol, partCol, vecCol, k, nprobe)

  /** Inverted-list ranking: cosine of the query against every list
    * centroid. `cents` is (partCol, dim|pos, centroid) rows — tiny
    * (nlists × dims); the query explodes and broadcasts. Shared by
    * [[ivfTopKPrebuilt]] and the persisted index's probe selection. */
  def ivfListScores(cents: DataFrame, queryVec: DataFrame, partCol: String,
                    vecCol: String, dimCol: String = "dim"): DataFrame = {
    val q = queryVec.select(posexplode(col(vecCol)).as(Seq(dimCol, "qx")))
      .select(col(dimCol), col("qx").cast("double").as("qx"))
    cents.join(broadcast(q), Seq(dimCol))
      .groupBy(col(partCol))
      .agg(sum(col("centroid") * col("qx")).as("cdot"),
        sum(col("centroid") * col("centroid")).as("cn2"),
        sum(col("qx") * col("qx")).as("qn2"))
      .select(col(partCol),
        round(col("cdot") / sqrt(col("cn2") * col("qn2")), 4).as("csim"))
  }

  // ---- product quantization (the memory/scan-bytes ANN path) ---------

  /** Train `m` per-subspace PQ codebooks (Jégou et al. 2011): the
    * vector splits into m contiguous blocks of dim/m coordinates and
    * each block gets its own `ksub`-centroid k-means codebook —
    * [[kmeansLloyd]] run m times over `slice`d block columns, so
    * training inherits its determinism (hash seeding, 4-dp rounded
    * centroids) and its scale shape (driver cost O(ksub·dsub) per
    * block, corpus scans bounded by the caller's training sample).
    * ksub defaults to 256 — one full byte per code, the standard PQ
    * dial (8 bits per subspace; coarser codebooks measurably cost
    * recall: 16 codes on the fixture drop recall@10 from 9/10 to
    * 5/10 at refine = 4). Returns m × ksub × dsub. */
  def pqTrainCodebooks(corpus: DataFrame, vecCol: String, m: Int,
                       ksub: Int = 256, iters: Int = 3): Seq[Seq[Seq[Double]]] = {
    require(m >= 1, s"m $m must be >= 1")
    require(ksub >= 1 && ksub <= 256, s"ksub $ksub must fit one byte")
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim must split evenly into $m blocks")
    val dsub = dim / m
    (0 until m).map { b =>
      val blk = corpus.select(
        slice(col(vecCol), b * dsub + 1, dsub).as("__blk"))
      centroidArrays(kmeansLloyd(blk, "__blk", ksub, iters))
        .map(_.toIndexedSeq)
    }
  }

  /** The coarse centroids as a k-row (cluster, __cvec) frame — the
    * broadcast side of every residual-PQ join (encode needs each
    * row's cell centroid; a k-row broadcast hash join is the
    * Spark-first way to hand it over without touching plan size). */
  private[graft] def centroidVecFrame(spark: org.apache.spark.sql.SparkSession,
                                      cents: Seq[Array[Double]]): DataFrame =
    spark.createDataFrame(
      cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) })
      .toDF("cluster", "__cvec")

  /** [[pqTrainCodebooks]] over RESIDUALS v − c(cluster) — the IVFADC
    * recipe (Jégou et al. 2011 §IV): after coarse assignment the
    * residual distribution is tighter than the raw corpus, so the same
    * m·log2(ksub) bits buy measurably more recall. `assigned` must
    * carry `clusterCol`; each row's cell centroid joins in broadcast
    * (k rows) and subtracts element-wise through the codegen'd
    * [[graft.expressions.VecSub]] kernel (the full-corpus encode runs
    * the fused [[graft.expressions.PqResidualEncode]] kernel; this was
    * the last interpreted zip_with on a vector data path). */
  def pqTrainCodebooksResidual(assigned: DataFrame, cents: Seq[Array[Double]],
                               vecCol: String, clusterCol: String, m: Int,
                               ksub: Int = 256, iters: Int = 3): Seq[Seq[Seq[Double]]] = {
    val centsDf = centroidVecFrame(assigned.sparkSession, cents)
      .withColumnRenamed("cluster", clusterCol)
    val resid = assigned
      .join(broadcast(centsDf), Seq(clusterCol))
      .select(graft.expressions.VecSub.vec_sub(
        col(vecCol), col("__cvec")).as("__resid"))
    pqTrainCodebooks(resid, "__resid", m, ksub, iters)
  }

  /** (id, pq_code) for every corpus row — the m-byte codes column a
    * pipeline persists NEXT TO the full vectors. At 100 TB this is the
    * point of PQ under columnar storage: the candidate scan reads
    * (id, pq_code) only — column pruning delivers the 32× byte cut a
    * custom compressed store would — and full vectors are read later
    * for the refine set alone. */
  def pqEncodeCorpus(corpus: DataFrame, idCol: String, vecCol: String,
                     codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    corpus.select(col(idCol),
      graft.expressions.PqCodec.pq_encode(col(vecCol), codebooks).as("pq_code"))

  /** PQ-compressed top-k: ADC cosine over the CODES (one fused kernel
    * scoring m table lookups per candidate, the per-query lookup table
    * built once), keep the best k·`refine` candidates, then EXACT
    * cosine rescoring of only those rows — so the full-vector scan is
    * semi-join-pruned to the refine set and the result ordering is
    * exact over it. `codes` supplies a precomputed [[pqEncodeCorpus]]
    * frame (the persisted-codes shape); absent, codes are derived
    * in-flight. Recall is the refine dial: k·refine ≥ corpus is exact
    * by construction (the spec pins it). RAW codes only — residual
    * (IVFADC) encoding needs each vector's coarse-cell assignment,
    * which is the served index's business
    * ([[graft.lake.AnnIndex.enablePq]] with `residual = true`). */
  def pqTopK(corpus: DataFrame, queryVec: DataFrame, idCol: String,
             vecCol: String, k: Int, codebooks: Seq[Seq[Seq[Double]]],
             refine: Int = 4, codes: Option[DataFrame] = None): DataFrame = {
    require(refine >= 1, s"refine $refine must be >= 1")
    val codesDf = codes.getOrElse(pqEncodeCorpus(corpus, idCol, vecCol, codebooks))
    val q = queryVec.select(col(vecCol).as("__qv"))
    val cand = codesDf.crossJoin(broadcast(q))
      .select(col(idCol), graft.expressions.PqCodec.pq_adc_cosine(
        col("__qv"), col("pq_code"), codebooks).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(k * refine)
      .select(col(idCol))
    bruteForceTopK(corpus.join(broadcast(cand), Seq(idCol), "left_semi"),
      queryVec, idCol, vecCol, k)
  }

  /** [[pqTopK]] for a query FRAME — the set-at-a-time twin (the
    * [[graft.lake.AnnIndex.topKJoin]] shape on the compressed path).
    * Stage 1 fans the broadcast query batch over the CODES column only
    * (8 B/row moves, vectors untouched) and keeps each query's
    * k·refine best by ADC rank — the rank shuffle carries (qid, id,
    * score), never embeddings. Stage 2 rescores exactly: the refine
    * ids join back to the full-vector table (at scale an id-pruned
    * second scan) and a per-query rank window emits the top k. Query
    * batches are assumed broadcastable — bounded per job, the same
    * contract as topKJoin's probe set. */
  def pqTopKJoin(corpus: DataFrame, queries: DataFrame, qidCol: String,
                 idCol: String, vecCol: String, k: Int,
                 codebooks: Seq[Seq[Seq[Double]]], refine: Int = 4,
                 codes: Option[DataFrame] = None): DataFrame = {
    require(refine >= 1, s"refine $refine must be >= 1")
    require(qidCol != idCol, "query id column collides with the corpus id")
    val codesDf = codes.getOrElse(pqEncodeCorpus(corpus, idCol, vecCol, codebooks))
    val q = queries.select(col(qidCol).as("__qid"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"))
    val Wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid")).orderBy(col("__adc").desc, col(idCol))
    val cand = codesDf
      .crossJoin(broadcast(q.select(col("__qid"), col("__qv"))))
      .select(col("__qid"), col(idCol), graft.expressions.PqCodec
        .pq_adc_cosine(col("__qv"), col("pq_code"), codebooks).as("__adc"))
      .withColumn("__rk", row_number().over(Wc))
      .filter(col("__rk") <= k * refine)
      .select(col("__qid"), col(idCol))
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid")).orderBy(col("score").desc, col(idCol))
    cand
      .join(corpus.select(col(idCol), col(vecCol).as("__v"),
        norm(col(vecCol)).as("__n")), Seq(idCol))
      .join(broadcast(q), Seq("__qid"))
      .select(col("__qid"), col(idCol), cosinePrenormed(
        col("__v"), col("__qv"), col("__n"), col("__qn")).as("score"))
      .withColumn("rk", row_number().over(W))
      .filter(col("rk") <= k)
      .select(col("__qid").as(qidCol), col(idCol), col("score"), col("rk"))
  }

  /** Search against a PREBUILT centroid table — how a real IVF index
    * separates build from search: the quantizer is built (and persisted)
    * once, each query pays only list scoring + the pruned scan, never a
    * per-query full-corpus centroid rebuild. */
  def ivfTopKPrebuilt(corpus: DataFrame, cents: DataFrame, queryVec: DataFrame,
                      idCol: String, partCol: String, vecCol: String, k: Int,
                      nprobe: Int = 2): DataFrame = {
    val probes = ivfListScores(cents, queryVec, partCol, vecCol)
      .orderBy(col("csim").desc, col(partCol))
      .limit(nprobe).select(col(partCol))
    bruteForceTopK(corpus.join(broadcast(probes), Seq(partCol)),
      queryVec, idCol, vecCol, k)
  }

  /** In-Context Pretraining document ordering (Shi et al. 2023:
    * "In-Context Pretraining: Language Modeling Beyond Document
    * Boundaries") — order a corpus so SEMANTICALLY RELATED documents
    * are adjacent, so that packing consecutive documents into a context
    * window gives the model related (not random) neighbors. The paper's
    * recipe: embed, retrieve nearest neighbors, then chain documents
    * greedily by similarity; at their scale the traveral is sharded.
    *
    * This engine's deterministic variant, blocked exactly like the
    * semantic-dedup family: documents are chained WITHIN each cluster
    * (`labelCol` — an IVF list / trained-quantizer assignment, the same
    * blocking [[graft.lake.AnnIndex]] and `semanticDedupBlocked` use),
    * and the clusters themselves are chained by CENTROID similarity, so
    * the corpus-level order is cluster-chain-major. Within a cluster the
    * walk starts at the LOWEST id and repeatedly moves to the unvisited
    * member with the highest cosine to the CURRENT document (4-dp
    * rounded — the engine-portable convention every vector query here
    * uses; ties break to the lowest id). The cluster chain starts at the
    * lowest label and greedily follows the highest rounded
    * centroid-to-centroid cosine. Both walks are total and
    * deterministic, so every engine, executor count and replay derives
    * the same epoch order (the [[graft.lake.CorpusPack]] seed
    * discipline).
    *
    * Returns (idCol long, labelCol long, label_rank, pos, prev_sim,
    * global_pos): `pos` is the position within the cluster's chain,
    * `prev_sim` the rounded cosine to the chain predecessor (null at
    * chain heads — the jump edges the paper's traversal also treats as
    * similarity-free), `global_pos` the corpus-level order key a packer
    * consumes.
    *
    * 100 TB posture: ONE shuffle of (id, vector) by cluster label —
    * unavoidable for any within-cluster traversal — then all O(m²·dim)
    * chain work runs cluster-local and embarrassingly parallel across
    * clusters (the paper's sharding); the centroid table, cluster-size
    * frame and cluster chain are |clusters|-bounded driver work (the
    * IVF-quantizer boundedness every ANN path here already relies on).
    * Cluster sizes are the quantizer's k dial: `maxClusterSize` refuses
    * loudly instead of letting one mega-cluster quadratic-bomb an
    * executor — raise k (more, smaller lists) rather than the cap. */
  def icpOrder(corpus: DataFrame, idCol: String, labelCol: String,
               vecCol: String, maxClusterSize: Int = 1 << 15): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cosArr(a: Array[Double], na: Double, b: Array[Double],
               nb: Double): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }
      round4(d / (na * nb))
    }

    // within-cluster greedy chains: one exchange on the label, then
    // cluster-local argmax walks (no further shuffles)
    val typed = corpus.select(col(labelCol).cast("long"),
        col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Long, Array[Double])]
    val chains = typed.groupByKey(_._1).flatMapGroups { (label, it) =>
      val members = it.map { case (_, id, v) => (id, v) }.toArray.sortBy(_._1)
      require(members.length <= maxClusterSize,
        s"icpOrder: cluster $label has ${members.length} members " +
          s"(> $maxClusterSize) - retrain the quantizer with more lists " +
          "instead of raising the cap")
      val norms = members.map { case (_, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        math.sqrt(s)
      }
      val m = members.length
      val visited = new Array[Boolean](m)
      val out = new Array[(Long, Long, Int, Option[Double])](m)
      var cur = 0 // lowest id = first after the sort
      visited(0) = true
      out(0) = (members(0)._1, label, 0, None)
      var step = 1
      while (step < m) {
        var best = -1
        var bestSim = Double.NegativeInfinity
        var j = 0
        while (j < m) {
          if (!visited(j)) {
            val s = cosArr(members(cur)._2, norms(cur), members(j)._2, norms(j))
            // strict > keeps the lowest-id tie-break (j ascends by id);
            // a zero-norm vector yields NaN cosine and never wins, so
            // the fallback below chains it last by id instead of
            // crashing the argmax (degenerate input, not a real path —
            // production embeddings are normalized)
            if (s > bestSim) { bestSim = s; best = j }
          }
          j += 1
        }
        if (best == -1) {
          var j2 = 0
          while (best == -1 && j2 < m) {
            if (!visited(j2)) best = j2
            j2 += 1
          }
          bestSim = Double.NaN
        }
        visited(best) = true
        out(step) = (members(best)._1, label, step, Some(bestSim))
        cur = best
        step += 1
      }
      out.iterator
    }.toDF(idCol, labelCol, "pos", "prev_sim")

    // cluster chain over the |clusters|-bounded rounded-centroid table;
    // cluster sizes ride the SAME aggregation (count per (label, dim)
    // is the member count), so centroids + offsets cost one scan, not
    // two — chains + this are the operator's only two corpus passes
    val centRows = corpus
      .select(col(labelCol).cast("long").as(labelCol),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(labelCol), col("dim"))
      .agg(round(avg(col("x").cast("double")), 4).as("centroid"),
        count(lit(1)).as("m"))
      .collect()
    val cents: Map[Long, Array[Double]] = centRows
      .groupBy(_.getLong(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    val sizes: Map[Long, Long] =
      centRows.filter(_.getInt(1) == 0).map(r => r.getLong(0) -> r.getLong(3)).toMap
    val cnorms = cents.map { case (l, v) =>
      l -> math.sqrt(v.map(x => x * x).sum)
    }
    val labels = cents.keys.toArray.sorted
    // Empty input → empty result with the full output schema
    // (labels.head below would throw NoSuchElementException on the
    // driver; icpPack inherits this early return).
    if (labels.isEmpty)
      return chains.limit(0)
        .select(col(idCol), col(labelCol), lit(0).as("label_rank"),
          col("pos"), col("prev_sim"), lit(0L).as("global_pos"))
    val rank = new scala.collection.mutable.HashMap[Long, Int]
    var curL = labels.head
    rank(curL) = 0
    while (rank.size < labels.length) {
      var bestL = -1L
      var bestSim = Double.NegativeInfinity
      labels.foreach { l =>
        if (!rank.contains(l)) {
          val s = cosArr(cents(curL), cnorms(curL), cents(l), cnorms(l))
          if (s > bestSim || (s == bestSim && (bestL == -1L || l < bestL))) {
            bestSim = s; bestL = l
          }
        }
      }
      rank(bestL) = rank.size
      curL = bestL
    }

    // |clusters|-bounded offsets: global_pos = chain offset + pos
    var acc = 0L
    val offs = rank.toSeq.sortBy(_._2).map { case (l, r) =>
      val o = (l, r, acc); acc += sizes(l); o
    }.toDF(labelCol, "label_rank", "off")

    chains.join(broadcast(offs), Seq(labelCol))
      .select(col(idCol), col(labelCol), col("label_rank"), col("pos"),
        col("prev_sim"), (col("off") + col("pos")).as("global_pos"))
      .orderBy(col("global_pos"))
  }
}
