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
    // Deterministic farthest-first seeding (k-means++ flavor without
    // rand()): first seed = smallest md5 of the rendered vector; each
    // next seed maximizes its min distance to the chosen seeds, md5 as
    // the tie-break. Smallest-hash-only seeding can draw every seed from
    // one dense cluster and Lloyd cannot recover from that.
    //
    // The k arg-max passes run on a DRIVER-BOUNDED deterministic sample
    // (the smallest-md5 rows — a uniform draw, and a superset of every
    // corpus ≤ sampleN, so small-corpus seeds are bit-identical to the
    // unsampled algorithm). Running them as Spark jobs would cost k
    // full-corpus scans — quadratic total scan work once k ∝ n (the
    // round-7 probe measured q110 at ×207 scan amplification before
    // this); the sample pins seeding at one TakeOrdered job, and the
    // full-corpus Lloyd iterations correct any sampling noise.
    val sampleN = math.max(2000, 50 * k)
    val hashed = corpus.select(col(vecCol))
      .withColumn("h", md5(concat_ws(",", col(vecCol))))
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
    val minD = Array.fill(sVecs.length)(Double.MaxValue)
    var cents: IndexedSeq[Array[Double]] = IndexedSeq(sVecs.head) // min md5
    while (cents.size < k) {
      var best = -1; var bestD = -1.0; var bestH = ""
      var i = 0
      while (i < sVecs.length) {
        val d = sqDistLocal(sVecs(i), cents.last)
        if (d < minD(i)) minD(i) = d
        if (minD(i) > bestD ||
            (minD(i) == bestD && (best == -1 || sHash(i) < bestH))) {
          best = i; bestD = minD(i); bestH = sHash(i)
        }
        i += 1
      }
      cents = cents :+ sVecs(best)
    }

    var it = 0
    while (it < iters) {
      // round(…, 4) on the aggregation output, per the engine's
      // determinism convention: an unrounded avg depends on partial-sum
      // ORDER, so the same corpus trained on 4 vs 32 threads produced
      // slightly different quantizers — and every downstream recall
      // number drifted with the environment. Rounded centroids make
      // index builds reproducible across cluster sizes.
      val next = assignClusters(corpus, cents, vecCol)
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
  }

  /** |v−c|² minus the per-row |v|² constant, for one literal centroid —
    * |c|² − 2·v·c via one codegen'd dot product. */
  private def sqDistRel(cvec: Array[Double], vec: Column): Column =
    lit(cvec.map(x => x * x).sum) -
      lit(2.0) * graft.expressions.VecDot.vec_dot(vec, lit(cvec))

  /** Nearest trained centroid per row (adds `cluster`). Ranking is by
    * squared L2 minus the per-row |v|² constant (|c|² − 2·v·c), k
    * codegen'd dot products per row — stays inside whole-stage codegen,
    * no join. Ties break to the smaller cluster id (deterministic). */
  def assignClusters(corpus: DataFrame, cents: Seq[Array[Double]],
                     vecCol: String): DataFrame = {
    val scored = cents.zipWithIndex.map { case (cvec, i) =>
      struct(sqDistRel(cvec, col(vecCol)).as("d"), lit(i).as("c"))
    }
    corpus.withColumn("cluster",
      (if (scored.size == 1) scored.head else least(scored: _*)).getField("c"))
  }

  /** Each row's `nAssign` nearest centroids, EXPLODED to one row per
    * (vector, cluster) — multi-probe blocking for candidate-pair
    * generation: a near-dup pair the quantizer splits across two cells
    * still collides in a shared second-choice cell. Blocking cost is a
    * constant ×nAssign on rows (×nAssign² on worst-case pairs), not a
    * growth term. Ranking ties break to the smaller cluster id, same as
    * [[assignClusters]]. */
  def assignClustersMulti(corpus: DataFrame, cents: Seq[Array[Double]],
                          vecCol: String, nAssign: Int): DataFrame = {
    val scored = cents.zipWithIndex.map { case (cvec, i) =>
      struct(sqDistRel(cvec, col(vecCol)).as("d"), lit(i).as("c"))
    }
    corpus.withColumn("cluster",
      explode(slice(sort_array(array(scored: _*)), 1, nAssign).getField("c")))
  }

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
}
