package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** The k ∝ n scale contract of the trained quantizer (q114 / AnnIndex):
  * driver seeding cost O(k·dim) — never O(n) sample rows or O(n²)
  * arg-max FLOPs — and an assignment plan whose EXPRESSION count stops
  * growing with k past [[VectorOps.LiteralCentroidMaxK]]. */
class VectorOpsSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf001, "embeddings")

  test("seeding sample is O(k) — constant below FarthestFirstMaxK, k above") {
    // seedSampleN is a pure function of k ALONE: the driver sample
    // cannot grow with the corpus. Below the farthest-first ceiling it
    // is the constant SeedSampleN; above it exactly k (the seeds
    // themselves — the centroid table size, irreducible). The removed
    // 50·k multiplier made q114's k = n/500 sample n/10 rows and spend
    // ~n²/5000 driver FLOPs in the spread pass.
    assert(VectorOps.seedSampleN(4) === VectorOps.SeedSampleN)
    assert(VectorOps.seedSampleN(VectorOps.FarthestFirstMaxK)
      === VectorOps.SeedSampleN)
    assert(VectorOps.seedSampleN(VectorOps.FarthestFirstMaxK + 1)
      === VectorOps.FarthestFirstMaxK + 1)
    assert(VectorOps.seedSampleN(100000) === 100000)
  }

  test("assignClusters/Multi: unrolled and array-literal plans agree row-for-row") {
    val cents = VectorOps.centroidArrays(
      VectorOps.kmeansLloyd(emb, "embedding", 6, iters = 2))
    def assignments(forceArray: Boolean): Map[Long, Int] =
      VectorOps.assignClustersImpl(emb, cents, "embedding", forceArray)
        .select(col("vec_id"), col("cluster"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val unrolled = assignments(forceArray = false)
    val viaArray = assignments(forceArray = true)
    assert(unrolled.size === 500)
    assert(unrolled === viaArray)

    def multi(forceArray: Boolean): Seq[(Long, Int)] =
      VectorOps.assignClustersMultiImpl(emb, cents, "embedding", 2, forceArray)
        .select(col("vec_id"), col("cluster"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    val mUnrolled = multi(forceArray = false)
    val mViaArray = multi(forceArray = true)
    assert(mUnrolled.size === 1000) // nAssign = 2 rows per vector
    assert(mUnrolled === mViaArray)
  }

  test("k past LiteralCentroidMaxK: ONE vec_dot expression in the plan, and correct") {
    val k = VectorOps.LiteralCentroidMaxK + 2
    // deterministic synthetic centroids spanning the space
    val cents = (0 until k).map(i =>
      Array.tabulate(64)(d => ((i * 31 + d * 7) % 11).toDouble - 5.0))
    val df = VectorOps.assignClusters(emb, cents, "embedding")
    val plan = df.queryExecution.analyzed.toString
    val dots = "vec_dot".r.findAllIn(plan).size
    assert(dots === 1,
      s"plan embeds $dots vec_dot nodes for k=$k — expression count must not ride k")
    // correctness against a local argmin (|c|² − 2·v·c, ties → smaller id)
    val got = df.select(col("vec_id"), col("cluster"), col("embedding"))
      .collect()
    assert(got.length === 500)
    got.foreach { r =>
      val v = r.getSeq[Float](2).map(_.toDouble).toArray
      val want = cents.zipWithIndex.map { case (c, i) =>
        (c.map(x => x * x).sum - 2.0 * c.zip(v).map(p => p._1 * p._2).sum, i)
      }.min._2
      assert(r.getInt(1) === want, s"vec ${r.getLong(0)}")
    }
  }

  test("semanticPairsBlocked sample training: tiny-sample fallback, pairs stable") {
    import graft.functions.DedupOps
    // a 1% draw of a small frame lands under k — the trainer must fall
    // back to the full corpus, making the run identical to pct=100
    val small = emb.limit(40)
    val full = DedupOps.semanticPairsBlocked(small, "vec_id", "embedding",
      threshold = 0.35).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fb = DedupOps.semanticPairsBlocked(small, "vec_id", "embedding",
      threshold = 0.35, trainSamplePct = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fb === full, "sub-k sample did not fall back to full training")
    // a real sample trains a usable quantizer: deterministic across runs
    val s1 = DedupOps.semanticPairsBlocked(emb, "vec_id", "embedding",
      threshold = 0.35, trainSamplePct = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s2 = DedupOps.semanticPairsBlocked(emb, "vec_id", "embedding",
      threshold = 0.35, trainSamplePct = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s1 === s2, "sampled training is not deterministic")
    assert(s1.nonEmpty, "sampled quantizer found no pairs at 0.35")
  }

  test("kmeansLloyd hash-seeds deterministically when k > FarthestFirstMaxK") {
    val k = VectorOps.FarthestFirstMaxK + 44 // 300: also > LiteralCentroidMaxK,
    // so the Lloyd iteration itself trains through the array-literal plan
    val cents = VectorOps.centroidArrays(
      VectorOps.kmeansLloyd(emb, "embedding", k, iters = 1))
    assert(cents.size === k)
    assert(cents.forall(_.length === 64))
    val again = VectorOps.centroidArrays(
      VectorOps.kmeansLloyd(emb, "embedding", k, iters = 1))
    assert(cents.zip(again).forall { case (a, b) => a.sameElements(b) })
  }
}
