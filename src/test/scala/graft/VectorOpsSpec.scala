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

  test("assignClusters/Multi: kernel, unrolled and array-literal shapes agree row-for-row") {
    val cents = VectorOps.centroidArrays(
      VectorOps.kmeansLloyd(emb, "embedding", 6, iters = 2))
    def assignments(forceArray: Boolean): Map[Long, Int] =
      VectorOps.assignClustersImpl(emb, cents, "embedding", forceArray)
        .select(col("vec_id"), col("cluster"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kernel = assignments(forceArray = false) // production: fused kernel
    val viaArray = assignments(forceArray = true)
    // third shape: the small-k unrolled-structs oracle, built directly
    val unrolled = emb.withColumn("cluster",
        array_min(VectorOps.scoredArr(cents, col("embedding"))).getField("c"))
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kernel.size === 500)
    assert(kernel === viaArray)
    assert(kernel === unrolled)

    def multi(forceArray: Boolean): Seq[(Long, Int)] =
      VectorOps.assignClustersMultiImpl(emb, cents, "embedding", 2, forceArray)
        .select(col("vec_id"), col("cluster"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    val mKernel = multi(forceArray = false)
    val mViaArray = multi(forceArray = true)
    assert(mKernel.size === 1000) // nAssign = 2 rows per vector
    assert(mKernel === mViaArray)
  }

  test("k past LiteralCentroidMaxK: ONE fused kernel node in the plan, and correct") {
    val k = VectorOps.LiteralCentroidMaxK + 2
    // deterministic synthetic centroids spanning the space
    val cents = (0 until k).map(i =>
      Array.tabulate(64)(d => ((i * 31 + d * 7) % 11).toDouble - 5.0))
    val df = VectorOps.assignClusters(emb, cents, "embedding")
    val plan = df.queryExecution.analyzed.toString
    // the fused NearestCentroid kernel: zero per-centroid expressions,
    // zero interpreted HOF lambdas — one node total regardless of k
    assert("vec_dot".r.findAllIn(plan).isEmpty,
      s"plan embeds vec_dot nodes for k=$k — the fused kernel should own the loop")
    assert("nearest_centroid".r.findAllIn(plan).size === 1,
      s"expected exactly one nearest_centroid node for k=$k")
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

  test("k past LiteralCentroidMaxK: kernel row-parity with the retired array shape") {
    val k = VectorOps.LiteralCentroidMaxK + 2
    val cents = (0 until k).map(i =>
      Array.tabulate(64)(d => ((i * 13 + d * 5) % 9).toDouble - 4.0))
    // single assignment: fused kernel (default) vs the typedLit+transform
    // oracle (forceArray) — same arithmetic, zero shared code
    def assignments(forceArray: Boolean): Map[Long, Int] =
      VectorOps.assignClustersImpl(emb, cents, "embedding", forceArray)
        .select(col("vec_id"), col("cluster"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kernel = assignments(forceArray = false)
    val oracle = assignments(forceArray = true)
    assert(kernel.size === 500)
    assert(kernel === oracle)
    // multi-probe: ordering within a vector's nAssign list must match
    // slice(sort_array(...)) — compare ordered per-vector sequences
    def multi(forceArray: Boolean): Map[Long, Seq[Int]] =
      VectorOps.assignClustersMultiImpl(emb, cents, "embedding", 3, forceArray)
        .select(col("vec_id"), col("cluster"))
        .collect().map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSeq }
    val mk = multi(forceArray = false)
    val mo = multi(forceArray = true)
    assert(mk.values.map(_.size).sum === 1500)
    // explode preserves array order, but collect() order is not
    // guaranteed across plans — compare as multisets per vector AND
    // check the kernel's own ascending-distance order directly
    assert(mk.view.mapValues(_.sorted).toMap === mo.view.mapValues(_.sorted).toMap)
    // tie-break determinism: duplicate centroids must rank by id
    val dupCents = cents.updated(5, cents(3).clone())
    val withTies = VectorOps.assignClustersMultiImpl(
        emb.limit(50), dupCents, "embedding", k, forceArrayPath = false)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1)
    val tieOracle = VectorOps.assignClustersMultiImpl(
        emb.limit(50), dupCents, "embedding", k, forceArrayPath = true)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1)
    assert(withTies.view.mapValues(_.map(_._2).toSeq).toMap ===
      tieOracle.view.mapValues(_.map(_._2).toSeq).toMap)
  }

  test("vec_dot/vec_sub reject non-float/double arrays at analysis") {
    import graft.expressions.{VecDot, VecSub}
    import spark.implicits._
    // the packed getFloat/getDouble reads would silently misread an
    // int array (4-byte slots read as 8) — the analyzer must refuse
    val ints = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val eDot = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(VecDot.vec_dot($"a", $"b")).collect()
    }
    assert(eDot.getMessage.contains("vec_dot"), eDot.getMessage)
    val eSub = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(VecSub.vec_sub($"a", $"b")).collect()
    }
    assert(eSub.getMessage.contains("vec_sub"), eSub.getMessage)
    // the two legal element types still work, mixed
    val fd = Seq((Array(1.0f, 2.0f), Array(0.5, 0.5)))
      .toDF("f", "d")
    assert(fd.select(VecDot.vec_dot($"f", $"d")).as[Double].head() === 1.5)
    assert(fd.select(VecSub.vec_sub($"f", $"d")).as[Array[Double]].head()
      .toSeq === Seq(0.5, 1.5))
  }

  test("CentroidKernel.round4 is bit-parity with Spark round(_, 4)") {
    import graft.expressions.CentroidKernel
    import spark.implicits._
    // halfway points, repeating binaries, signs, zero/NaN/Inf — the
    // probe kernel's score must round EXACTLY like the round(cos, 4)
    // expression it replaced, or probe order drifts on boundary cosines
    val vals = Seq(0.00005, -0.00005, 0.99995, -0.99995, 0.12345, -0.12345,
      1.0 / 3.0, -1.0 / 3.0, 2.0 / 3.0, 0.0001499999999, 0.000150000001,
      0.0, -0.0, 1.0, -1.0, 0.987654321, -0.987654321,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val sparkSide = vals.toDF("x").select(round(col("x"), 4).as("r"))
      .collect().map(_.getDouble(0))
    vals.zip(sparkSide).foreach { case (x, want) =>
      val got = CentroidKernel.round4(x)
      assert(java.lang.Double.doubleToLongBits(got) ===
        java.lang.Double.doubleToLongBits(want), s"round4($x): $got != $want")
    }
    // the scaled-integer fast path must agree with the exact BigDecimal
    // path everywhere: random cosines, every representable value NEAR a
    // half boundary (the regime the fast path must punt on), large
    // magnitudes past the fast-path gate, and subnormals
    val rnd = new scala.util.Random(11)
    val fuzz = Seq.fill(200000)(rnd.nextDouble() * 2 - 1) ++
      (-20000 to 20000).flatMap { k =>
        val half = (k.toDouble + 0.5) / 1e4
        Seq(half, Math.nextUp(half), Math.nextDown(half))
      } ++
      Seq.fill(1000)(rnd.nextDouble() * 1e12 - 5e11) ++
      Seq(Double.MinPositiveValue, -Double.MinPositiveValue, 1e-300, 4.9e8, 1.0000001e4)
    fuzz.foreach { x =>
      assert(java.lang.Double.doubleToLongBits(CentroidKernel.round4(x)) ===
        java.lang.Double.doubleToLongBits(CentroidKernel.round4Exact(x)),
        s"fast path diverged at $x")
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

  test("PQ encode + ADC agree with a driver-side reference (float and double)") {
    import graft.expressions.PqCodec
    import spark.implicits._
    // tiny hand-checkable codec: 2 blocks × 3 codes × 2 dims
    val cbs: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(-1.0, 2.0)),
      Seq(Seq(2.0, 0.0), Seq(0.0, -2.0), Seq(0.5, 0.5)))
    def refEncode(v: Array[Double]): Seq[Int] = (0 until 2).map { b =>
      cbs(b).zipWithIndex.minBy { case (c, i) =>
        val d = c.zipWithIndex.map { case (x, j) =>
          val vj = if (b * 2 + j < v.length) v(b * 2 + j) else 0.0
          (x - vj) * (x - vj)
        }.sum
        (d, i)
      }._2
    }
    def refRecon(codes: Seq[Int]): Array[Double] =
      codes.zipWithIndex.flatMap { case (c, b) => cbs(b)(c) }.toArray
    val vecs = Seq(
      Array(0.9, 1.1, 1.9, 0.1), Array(-1.2, 2.2, 0.4, 0.6),
      Array(0.0, 0.0, 0.0, 0.0), Array(5.0, -5.0, -5.0, 5.0),
      Array(1.0, 1.0)) // SHORT vector: missing coords read as zero
    val q = Array(0.3, -0.7, 1.5, 0.25)
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val got = df.select(col("id"),
          PqCodec.pq_encode(col("vec"), cbs).as("code"),
          PqCodec.pq_adc_dot(typedLit(q.toSeq), PqCodec.pq_encode(col("vec"), cbs), cbs).as("adc"))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getDouble(2)))
      got.foreach { case (id, code, adc) =>
        val v = vecs(id.toInt)
        val want = refEncode(v)
        assert(code.map(_ & 0xff).toSeq === want, s"vec $id encode")
        val recon = refRecon(want)
        val wantDot = q.zip(recon).map(p => p._1 * p._2).sum
        assert(math.abs(adc - wantDot) < 1e-12, s"vec $id adc $adc != $wantDot")
      }
    }
    val ids = vecs.indices.map(_.toLong)
    check(ids.map(i => (i, vecs(i.toInt))).toDF("id", "vec"))
    check(ids.map(i => (i, vecs(i.toInt).map(_.toFloat))).toDF("id", "vec"))
  }

  test("residual PQ encode + ADC cosine agree with a driver-side reference") {
    import graft.expressions.PqCodec
    import spark.implicits._
    val cbs: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(-1.0, 2.0)),
      Seq(Seq(2.0, 0.0), Seq(0.0, -2.0), Seq(0.5, 0.5)))
    // the documented ranking quantity (|c|² − 2·c·r, summed
    // left-to-right — the NearestCentroid/PqEncode convention), NOT
    // naive |c − r|²: the two round differently on exact-arithmetic
    // ties (this fixture has one), and the convention is the contract
    def refEncode(v: Array[Double]): Seq[Int] = (0 until 2).map { b =>
      cbs(b).zipWithIndex.minBy { case (c, i) =>
        val n2 = c.map(x => x * x).sum
        val dot = c.zipWithIndex.map { case (x, j) =>
          val vj = if (b * 2 + j < v.length) v(b * 2 + j) else 0.0
          x * vj
        }.sum
        (n2 - 2.0 * dot, i)
      }._2
    }
    def refRecon(codes: Seq[Int]): Array[Double] =
      codes.zipWithIndex.flatMap { case (c, b) => cbs(b)(c) }.toArray
    val cents = Seq(
      Array(0.5, 0.5, 0.5, 0.5), Array(-1.0, 1.5, 2.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0))
    val vecs = Seq(
      Array(0.9, 1.1, 1.9, 0.1), Array(-1.2, 2.2, 0.4, 0.6),
      Array(0.0, 0.0, 0.0, 0.0), Array(5.0, -5.0, -5.0, 5.0),
      Array(1.0, 1.0)) // SHORT vector: missing coords read as zero
    val q = Array(0.3, -0.7, 1.5, 0.25)
    def refResidual(v: Array[Double], c: Array[Double]): Array[Double] =
      Array.tabulate(4)(i =>
        (if (i < v.length) v(i) else 0.0) - (if (i < c.length) c(i) else 0.0))
    def check(df: org.apache.spark.sql.DataFrame, cvecDouble: Boolean): Unit = {
      val cvecCol =
        if (cvecDouble) col("cvec") else col("cvec").cast("array<float>")
      val got = df.select(col("id"),
          PqCodec.pq_residual_encode(col("vec"), cvecCol, cbs).as("code"),
          PqCodec.pq_residual_adc_cosine(typedLit(q.toSeq),
            PqCodec.pq_residual_encode(col("vec"), cvecCol, cbs),
            cvecCol, cbs).as("score"))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getDouble(2)))
      got.foreach { case (id, code, score) =>
        val v = vecs(id.toInt % vecs.size)
        val c = cents(id.toInt / vecs.size)
        val cRounded = // the float cast costs precision the ref must mirror
          if (cvecDouble) c else c.map(x => x.toFloat.toDouble)
        val want = refEncode(refResidual(v, cRounded))
        assert(code.map(_ & 0xff).toSeq === want, s"row $id encode")
        val recon = cRounded.zip(refRecon(want)).map(p => p._1 + p._2)
        val dot = q.zip(recon).map(p => p._1 * p._2).sum
        val rn = math.sqrt(recon.map(x => x * x).sum)
        val wantScore =
          if (rn == 0.0) Double.NegativeInfinity else dot / rn
        assert(math.abs(score - wantScore) < 1e-9,
          s"row $id score $score != $wantScore")
      }
    }
    // every (vector, centroid) combination, both element types each side
    val rows = for {
      ci <- cents.indices; vi <- vecs.indices
    } yield ((ci * vecs.size + vi).toLong, vecs(vi), cents(ci).toSeq)
    check(rows.toDF("id", "vec", "cvec"), cvecDouble = true)
    check(rows.map { case (i, v, c) => (i, v.map(_.toFloat), c) }
      .toDF("id", "vec", "cvec"), cvecDouble = true)
    check(rows.toDF("id", "vec", "cvec"), cvecDouble = false)
  }

  test("PQ ADC per-thread table survives interleaved queries") {
    import graft.expressions.PqCodec
    import spark.implicits._
    val cbs = VectorOps.pqTrainCodebooks(emb, "embedding", m = 8, ksub = 8,
      iters = 1)
    val codes = VectorOps.pqEncodeCorpus(emb.limit(64), "vec_id", "embedding", cbs)
    val qs = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("__qv"))
    // one partition forces the two queries to INTERLEAVE through one
    // thread's cached lookup table — scores must match the per-query runs
    val inter = codes.crossJoin(qs).repartition(1)
      .select(col("qid"), col("vec_id"),
        PqCodec.pq_adc_cosine(col("__qv"), col("pq_code"), cbs).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    (0L until 2L).foreach { qid =>
      val solo = codes.crossJoin(qs.filter(col("qid") === qid))
        .select(col("vec_id"),
          PqCodec.pq_adc_cosine(col("__qv"), col("pq_code"), cbs).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      solo.foreach { case (id, s) =>
        assert(inter((qid, id)) === s, s"query $qid vec $id drifted")
      }
    }
  }

  test("pqTopK: exact when refine covers the corpus; recall holds at refine=4") {
    // the standard PQ dial: 8 blocks × 256 codes (8 bits/subspace)
    val cbs = VectorOps.pqTrainCodebooks(emb, "embedding", m = 8, iters = 2)
    val query = emb.filter(col("vec_id") === 0)
    val exact = VectorOps.bruteForceTopK(emb, query, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // refine big enough that the candidate stage keeps everything —
    // the two-stage search must then BE brute force, bit for bit
    val full = VectorOps.pqTopK(emb, query, "vec_id", "embedding", 10, cbs,
        refine = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === exact)
    // the compressed path at the production dial: recall@10 ≥ 0.6 on
    // the fixture (measured ~0.8-1.0; the floor leaves drift margin)
    val got = VectorOps.pqTopK(emb, query, "vec_id", "embedding", 10, cbs,
        refine = 4)
      .collect().map(_.getLong(0)).toSet
    val hits = exact.map(_._1).count(got.contains)
    assert(hits >= 6, s"recall@10 too low: $hits/10")
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

  test("TripletOps: known geometry picks best positives; flags encode negative quality") {
    import graft.functions.TripletOps
    import spark.implicits._
    // two tight pairs on orthogonal axes plus two fillers — positives
    // are known by construction, negatives are structural invariants
    // (the seeded draw is deterministic but geometry-blind)
    val vs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.999, 0.04)),   // pair A
      (2L, Seq(0.0, 1.0)), (3L, Seq(0.01, 0.999)),   // pair B
      (4L, Seq(-1.0, 0.2)), (5L, Seq(0.7, -0.7))     // fillers
    ).toDF("vec_id", "embedding")
    val pairs = Seq((0L, 1L), (2L, 3L)).toDF("id_a", "id_b")
    val got = TripletOps.mineTriplets(vs, "vec_id", "embedding", pairs,
      negThreshold = 0.8).collect()
      .map(r => r.getLong(0) -> r).toMap
    // one triplet per anchor in the graph, and only those anchors
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got(0L).getAs[Long]("pos_id") === 1L)
    assert(got(1L).getAs[Long]("pos_id") === 0L)
    assert(got(2L).getAs[Long]("pos_id") === 3L)
    assert(got(3L).getAs[Long]("pos_id") === 2L)
    // the flag recomputes from the emitted row: clean ⟺ cosine below
    // threshold and the draw is neither endpoint — check CONSISTENCY
    // against the row's own neg_cos/ids rather than pinning the draw
    got.values.foreach { r =>
      val clean = r.getAs[Double]("neg_cos") < 0.8 &&
        r.getAs[Long]("neg_id") != r.getLong(0) &&
        r.getAs[Long]("neg_id") != r.getAs[Long]("pos_id")
      assert(r.getAs[Int]("neg_clean") === (if (clean) 1 else 0), r.toString)
      assert(Set(0L, 1L, 2L, 3L, 4L, 5L).contains(r.getAs[Long]("neg_id")))
    }
    // determinism: a replay mines byte-identical triplets
    val again = TripletOps.mineTriplets(vs, "vec_id", "embedding", pairs,
      negThreshold = 0.8).collect().map(_.toString).sorted
    assert(again.sameElements(
      got.values.map(_.toString).toArray.sorted))
    // a corpus of near-identical vectors cannot yield a clean negative
    val dup = (0L to 3L).map(i => (i, Seq(1.0, i * 1e-4)))
      .toDF("vec_id", "embedding")
    val dupPairs = Seq((0L, 1L)).toDF("id_a", "id_b")
    val flags = TripletOps.mineTriplets(dup, "vec_id", "embedding",
        dupPairs, negThreshold = 0.8)
      .select(col("neg_clean")).collect().map(_.getInt(0))
    assert(flags.nonEmpty && flags.forall(_ === 0),
      "identical-corpus negatives must flag dirty")
    // the guard: a 1-row corpus cannot rotate to a distinct negative
    val one = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException](
      TripletOps.mineTriplets(one, "vec_id", "embedding",
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), 0.8))
    assert(err.getMessage.contains(">= 2"))
  }

  test("vec_sub: parity with the zip_with shape (both element types, ragged lengths)") {
    import graft.expressions.VecSub.vec_sub
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // double-element left vs double right, including ragged lengths
    // (zip_with pads the shorter side with null → coalesce 0.0)
    val rows = (1 to 50).map { i =>
      (i.toLong,
        Seq.fill(3 + rnd.nextInt(4))(rnd.nextDouble() * 10 - 5),
        Seq.fill(3 + rnd.nextInt(4))(rnd.nextDouble() * 10 - 5))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select($"id",
        vec_sub($"a", $"b").as("fused"),
        zip_with($"a", $"b",
          (x, y) => coalesce(x, lit(0.0)) - coalesce(y, lit(0.0))).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Double](1) === r.getSeq[Double](2), s"id=${r.getLong(0)}")
    }
    // float-element left (the embeddings column type) vs double right
    val fdf = rows.map { case (i, a, b) => (i, a.map(_.toFloat), b) }
      .toDF("id", "a", "b")
    val fBoth = fdf.select($"id",
        vec_sub($"a", $"b").as("fused"),
        zip_with($"a".cast("array<double>"), $"b",
          (x, y) => coalesce(x, lit(0.0)) - coalesce(y, lit(0.0))).as("hof"))
      .collect()
    fBoth.foreach { r =>
      assert(r.getSeq[Double](1) === r.getSeq[Double](2), s"id=${r.getLong(0)}")
    }
  }

  test("icpOrder: greedy similarity chains, cluster chaining, permutation") {
    import spark.implicits._
    // hand-built clusters: within label 0, vectors sit on a 2-D fan so
    // the greedy chain from the lowest id is hand-computable — 0 is at
    // angle 0°, 1 at 90°, 2 at 10°, 3 at 80°. From 0 the most similar
    // is 2 (10°), then 3 (Δ70° beats 1's Δ80°... from 2: 3 at Δ70°,
    // 1 at Δ80° → 3), then 1. Label 1 is a singleton; label 2 points
    // OPPOSITE label 0 so the centroid chain is 0 → 1 → 2 (label 1's
    // centroid is nearer 0's than label 2's antipode).
    def ang(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val df = Seq(
      (0L, ang(0), 0), (1L, ang(90), 0), (2L, ang(10), 0), (3L, ang(80), 0),
      (10L, ang(45), 1),
      (20L, ang(180), 2), (21L, ang(190), 2))
      .toDF("vec_id", "embedding", "label")
    val got = VectorOps.icpOrder(df, "vec_id", "label", "embedding")
      .select($"vec_id", $"label", $"label_rank", $"pos", $"global_pos")
      .as[(Long, Long, Int, Int, Long)].collect().sortBy(_._5)
    assert(got.map(_._1).toSeq === Seq(0L, 2L, 3L, 1L, 10L, 20L, 21L),
      s"wrong order: ${got.mkString(", ")}")
    assert(got.map(_._5).toSeq === (0L until 7L), "global_pos must be dense")
    assert(got.map(g => (g._2, g._3)).distinct.toSeq ===
      Seq((0L, 0), (1L, 1), (2L, 2)), "centroid chain 0 -> 1 -> 2")
    assert(got.map(g => (g._2, g._4)).groupBy(_._1).forall { case (_, ps) =>
      ps.map(_._2).sorted.toSeq == (0 until ps.length) },
      "pos must be dense within each cluster")

    // prev_sim: null exactly at the three chain heads, and each link's
    // similarity is the max over the docs that were still unvisited
    val full = VectorOps.icpOrder(df, "vec_id", "label", "embedding")
      .select($"label", $"pos", $"prev_sim")
      .as[(Long, Int, Option[Double])].collect()
    assert(full.count(_._3.isEmpty) === 3)
    assert(full.forall { case (_, pos, ps) => (pos == 0) == ps.isEmpty })

    // a mega-cluster refuses loudly instead of quadratic-bombing
    val big = (0 until 40).map(i => (i.toLong, ang(i * 3.0), 0))
      .toDF("vec_id", "embedding", "label")
    val ex = intercept[Exception](
      VectorOps.icpOrder(big, "vec_id", "label", "embedding",
        maxClusterSize = 10).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("retrain the quantizer")),
      s"wrong failure: $ex")

    // empty input: empty result with the full schema, not a driver
    // NoSuchElementException from the centroid chain walk
    val empty = VectorOps.icpOrder(df.limit(0), "vec_id", "label", "embedding")
    assert(empty.columns.toSeq ===
      Seq("vec_id", "label", "label_rank", "pos", "prev_sim", "global_pos"))
    assert(empty.count() === 0L)
  }

  test("prop: icpOrder == a naive reference on random clustered vectors") {
    import spark.implicits._
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (d, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, na, nb), (x, y)) =>
          (d + x.toDouble * y, na + x.toDouble * x, nb + y.toDouble * y)
      }
      round4(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    // independent implementation of the same spec, collections-style
    def naive(rows: Seq[(Long, Seq[Float], Long)])
        : Seq[(Long, Long, Int, Int, Long)] = {
      val byLabel = rows.groupBy(_._3)
      val chains = byLabel.map { case (l, ms) =>
        val sorted = ms.sortBy(_._1)
        var chain = List(sorted.head)
        var rest = sorted.tail.toList
        while (rest.nonEmpty) {
          val cur = chain.head
          val next = rest.minBy(r => (-cos(cur._2, r._2), r._1))
          chain ::= next
          rest = rest.filterNot(_._1 == next._1)
        }
        l -> chain.reverse.map(_._1)
      }
      val cents = byLabel.map { case (l, ms) =>
        val dim = ms.head._2.length
        l -> (0 until dim).map(d =>
          round4(ms.map(_._2(d).toDouble).sum / ms.size).toFloat)
      }
      val labels = cents.keys.toSeq.sorted
      var lchain = List(labels.head)
      var lrest = labels.tail
      while (lrest.nonEmpty) {
        val next = lrest.minBy(l => (-cos(cents(lchain.head), cents(l)), l))
        lchain ::= next
        lrest = lrest.filterNot(_ == next)
      }
      val ranked = lchain.reverse.zipWithIndex.toMap
      var off = 0L
      lchain.reverse.flatMap { l =>
        val c = chains(l)
        val res = c.zipWithIndex.map { case (id, p) =>
          (id, l, ranked(l), p, off + p)
        }
        off += c.size
        res
      }
    }
    val rnd = new scala.util.Random(20260815L)
    (1 to 4).foreach { round =>
      val nLabels = 2 + rnd.nextInt(3)
      val dim = 4 + rnd.nextInt(5)
      val rows = (0 until 30 + rnd.nextInt(40)).map { i =>
        (i.toLong,
          Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat),
          rnd.nextInt(nLabels).toLong)
      }
      val got = VectorOps.icpOrder(
          rows.toDF("vec_id", "embedding", "label"),
          "vec_id", "label", "embedding")
        .select($"vec_id", $"label", $"label_rank", $"pos", $"global_pos")
        .as[(Long, Long, Int, Int, Long)].collect().sortBy(_._5).toSeq
      assert(got === naive(rows), s"round=$round dim=$dim labels=$nLabels")
    }
  }

  test("TripletOps: a pair id missing from emb fails loudly, not a silent drop") {
    import graft.functions.TripletOps
    import spark.implicits._
    val vs = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val orphaned = Seq((0L, 9L)).toDF("id_a", "id_b")
    val ex = intercept[Exception](
      TripletOps.mineTriplets(vs, "vec_id", "embedding", orphaned, 0.8)
        .collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("missing from emb")),
      s"wrong failure: $ex")
  }
}
