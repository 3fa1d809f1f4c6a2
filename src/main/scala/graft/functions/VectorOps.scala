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
    val hashed = corpus.select(col(vecCol))
      .withColumn("h", md5(concat_ws(",", col(vecCol))))
    val firstSeed = hashed.orderBy(col("h")).select(col(vecCol)).take(1)
    require(firstSeed.nonEmpty,
      "k-means training corpus is empty — nothing to seed the quantizer from")
    var cents: IndexedSeq[Array[Double]] = IndexedSeq(vecOf(firstSeed.head))
    while (cents.size < k) {
      cents = cents :+ vecOf(hashed
        .withColumn("d2", sqDistToNearest(cents, col(vecCol)))
        .orderBy(desc("d2"), col("h"))
        .select(col(vecCol)).head())
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

  /** True squared distance to the nearest of `cents` (includes |v|²). */
  private def sqDistToNearest(cents: Seq[Array[Double]], vec: Column): Column = {
    val rel = cents.map(sqDistRel(_, vec))
    graft.expressions.VecDot.vec_dot(vec, vec) +
      (if (rel.size == 1) rel.head else least(rel: _*))
  }

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
