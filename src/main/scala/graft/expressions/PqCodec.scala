package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization codec for embedding columns — the memory/scan
  * side of ANN at corpus scale (Jégou et al. 2011's PQ, the IVF-PQ
  * recipe FAISS ships): the vector space splits into `m` contiguous
  * subspaces, each with its own `ksub`-centroid codebook, and a vector
  * is stored as m one-byte codes — 64-dim float32 embeddings (256 B)
  * become 8 B, a 32× compression.
  *
  * The Spark-first framing of the win: codes live in their OWN
  * parquet column, so the candidate-generation scan column-prunes to
  * (id, codes) and never reads the full vectors — the IO cut falls
  * out of columnar storage rather than a custom store. Exact rescoring
  * then reads full vectors ONLY for the refine set (a semi-join-pruned
  * second scan). See [[graft.functions.VectorOps.pqTopK]].
  *
  * Fused native kernels over a flat codebook array (the
  * [[CentroidKernel]] pattern):
  *  - [[PqEncode]]: vector → m-byte code (per block, nearest
  *    sub-centroid by the same |c|² − 2·v·c ranking / tie-break as
  *    [[NearestCentroid]]);
  *  - [[PqAdcDot]]: (query, codes) → Σ_b q_b · cent[b, code_b] — the
  *    asymmetric-distance dot against the RECONSTRUCTION, computed
  *    through a per-thread lookup table (m×ksub partial dots built
  *    once per distinct query and reused across its candidates — the
  *    classic ADC table, keyed by query content so interleaved
  *    queries stay correct);
  *  - [[PqResidualEncode]] / [[PqResidualAdcCosine]]: the IVFADC
  *    twins — codes quantize v − c(cluster) (the coarse cell's
  *    residual), so the same bits model a tighter distribution;
  *    ranking reconstructs v̂ = c + r̂ against the query.
  */
final class PqKernel(val m: Int, val ksub: Int, val dsub: Int,
                     flat: Array[Double],
                     val lutEntries: Int = PqKernel.DefaultLutEntries)
    extends Serializable {
  require(lutEntries >= 1, s"lutEntries $lutEntries must be >= 1")
  // flat layout: ((b * ksub + c) * dsub + d)
  val dim: Int = m * dsub

  private def blockN2(b: Int, c: Int): Double = {
    val base = (b * ksub + c) * dsub
    var s = 0.0
    var d = 0
    while (d < dsub) { val x = flat(base + d); s += x * x; d += 1 }
    s
  }
  // |cent|² per (block, code), precomputed once per executor instance
  @transient private lazy val n2: Array[Double] = {
    val a = new Array[Double](m * ksub)
    var i = 0
    while (i < m * ksub) { a(i) = blockN2(i / ksub, i % ksub); i += 1 }
    a
  }

  def encode(vec: ArrayData, isFloat: Boolean): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte](m)
    var b = 0
    while (b < m) {
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (b * ksub + c) * dsub
        var dot = 0.0
        var d = 0
        // positions past the vector's length contribute zero (the
        // min(len, dim) convention of the engine's vector kernels)
        val lim = math.min(dsub, math.max(0, n - b * dsub))
        if (isFloat) while (d < lim) { dot += vec.getFloat(b * dsub + d).toDouble * flat(base + d); d += 1 }
        else while (d < lim) { dot += vec.getDouble(b * dsub + d) * flat(base + d); d += 1 }
        val dist = n2(b * ksub + c) - 2.0 * dot
        val cmp = java.lang.Double.compare(dist, bestD)
        if (cmp < 0) { bestD = dist; bestC = c }
        c += 1
      }
      out(b) = bestC.toByte
      b += 1
    }
    out
  }

  /** [[encode]] over the RESIDUAL v − c (Jégou et al. 2011 §IVFADC):
    * the coarse cell's centroid is subtracted before quantization, so
    * the codebooks model the residual distribution — tighter than the
    * raw corpus at the same m·log2(ksub) bits. Positions past either
    * array's length read as zero (the engine's min(len, dim)
    * convention applied to both operands). */
  def encodeResidual(vec: ArrayData, isFloat: Boolean,
                     cvec: ArrayData, isFloatC: Boolean): Array[Byte] = {
    val resid = new Array[Double](dim)
    val nv = math.min(vec.numElements(), dim)
    val nc = math.min(cvec.numElements(), dim)
    var i = 0
    if (isFloat) while (i < nv) { resid(i) = vec.getFloat(i).toDouble; i += 1 }
    else while (i < nv) { resid(i) = vec.getDouble(i); i += 1 }
    i = 0
    if (isFloatC) while (i < nc) { resid(i) -= cvec.getFloat(i).toDouble; i += 1 }
    else while (i < nc) { resid(i) -= cvec.getDouble(i); i += 1 }
    val out = new Array[Byte](m)
    var b = 0
    while (b < m) {
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (b * ksub + c) * dsub
        var dot = 0.0
        var d = 0
        while (d < dsub) { dot += resid(b * dsub + d) * flat(base + d); d += 1 }
        val dist = n2(b * ksub + c) - 2.0 * dot
        if (java.lang.Double.compare(dist, bestD) < 0) { bestD = dist; bestC = c }
        c += 1
      }
      out(b) = bestC.toByte
      b += 1
    }
    out
  }

  /** Per-thread ADC tables, an LRU of up to `lutEntries` (query
    * content hash → (query copy, LUT)). Bounded capacity matters:
    * joined candidate rows INTERLEAVE query ids (hash/nested-loop
    * iteration order cycles the broadcast queries per candidate), so
    * a single-entry cache would rebuild the m×ksub×dsub table on
    * nearly every row whenever a batch holds >1 query — costing far
    * more than the m-lookup ADC saves (measured 40-70× slower on an
    * 8-query worst-case interleave at the 8×256×8 shape, MicroBench
    * "adc interleaved"). The default capacity
    * covers a broadcastable query batch (64 × (dim + m·ksub) doubles
    * ≈ 1 MiB/thread at the 64-dim/8×256 shape); past it, LRU
    * eviction degrades gracefully toward rebuild-per-row. Entries are
    * content-compared on hash match, so interleaved queries and hash
    * collisions can never read a stale table. */
  @transient private lazy val lutCache =
    new ThreadLocal[java.util.LinkedHashMap[java.lang.Long, (Array[Double], Array[Double])]] {
      override def initialValue() =
        new java.util.LinkedHashMap[java.lang.Long, (Array[Double], Array[Double])](
            lutEntries * 2, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[java.lang.Long, (Array[Double], Array[Double])]): Boolean =
            size() > lutEntries
        }
    }

  private def queryCopy(vec: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = math.min(vec.numElements(), dim)
    val q = new Array[Double](dim) // zero-padded past the query length
    var i = 0
    if (isFloat) while (i < n) { q(i) = vec.getFloat(i).toDouble; i += 1 }
    else while (i < n) { q(i) = vec.getDouble(i); i += 1 }
    q
  }

  private def contentHash(q: Array[Double]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < q.length) {
      h = 31 * h + java.lang.Double.doubleToLongBits(q(i)); i += 1
    }
    h
  }

  def adcDot(query: ArrayData, isFloat: Boolean, codes: Array[Byte]): Double = {
    require(codes.length == m,
      s"PQ code length ${codes.length} != m=$m subspaces")
    val q = queryCopy(query, isFloat)
    val h = java.lang.Long.valueOf(contentHash(q))
    val cache = lutCache.get()
    var entry = cache.get(h)
    if (entry == null || !java.util.Arrays.equals(entry._1, q)) {
      val lut = new Array[Double](m * ksub)
      var b = 0
      while (b < m) {
        var c = 0
        while (c < ksub) {
          val base = (b * ksub + c) * dsub
          var dot = 0.0
          var d = 0
          while (d < dsub) { dot += q(b * dsub + d) * flat(base + d); d += 1 }
          lut(b * ksub + c) = dot
          c += 1
        }
        b += 1
      }
      entry = (q, lut)
      cache.put(h, entry)
    }
    val lut = entry._2
    var s = 0.0
    var b = 0
    while (b < m) { s += lut(b * ksub + (codes(b) & 0xff)); b += 1 }
    s
  }

  /** ADC dot NORMALIZED by the reconstruction's norm — the candidate
    * ranking [[graft.functions.VectorOps.pqTopK]] sorts on. Exact for
    * the reconstruction: blocks are disjoint coordinates, so
    * |v̂|² = Σ_b |cent_{b,code_b}|² (m lookups into the precomputed n2
    * table, no extra FLOPs). The query's own norm is a per-query
    * constant — rank-invariant, deliberately NOT divided out. A
    * zero-norm reconstruction scores −∞ (never selected; NaN would
    * sort FIRST under a descending order). */
  def adcCosine(query: ArrayData, isFloat: Boolean, codes: Array[Byte]): Double = {
    val dot = adcDot(query, isFloat, codes)
    var rn2 = 0.0
    var b = 0
    while (b < m) { rn2 += n2(b * ksub + (codes(b) & 0xff)); b += 1 }
    if (rn2 == 0.0) Double.NegativeInfinity else dot / math.sqrt(rn2)
  }

  /** [[adcCosine]] in RESIDUAL mode: the reconstruction is
    * v̂ = c + r̂ (coarse centroid + decoded residual), so
    *   q·v̂   = q·c + LUT_q(codes)        (the LUT covers the residual
    *                                      part — per-query, reused
    *                                      across its candidates)
    *   |v̂|²  = |c|² + 2·c·r̂ + |r̂|²     (c·r̂ and |c|² are direct
    *                                      dim-FLOP loops — c varies
    *                                      per CANDIDATE, so a LUT
    *                                      would rebuild per row and
    *                                      cost m·ksub·dsub ≫ dim)
    * A non-positive |v̂|² (zero reconstruction, or negative by sub-ulp
    * cancellation when r̂ ≈ −c) scores −∞ — never selected, same
    * posture as [[adcCosine]]'s zero-norm branch. */
  def adcCosineResidual(query: ArrayData, isFloat: Boolean,
                        codes: Array[Byte], cvec: ArrayData,
                        isFloatC: Boolean): Double = {
    val qr = adcDot(query, isFloat, codes) // q·r̂, per-query LUT
    val nc = math.min(cvec.numElements(), dim)
    val nq = math.min(query.numElements(), dim)
    // q·c and |c|² — one direct pass over the centroid
    var qc = 0.0
    var cn2 = 0.0
    var i = 0
    while (i < nc) {
      val cx = if (isFloatC) cvec.getFloat(i).toDouble else cvec.getDouble(i)
      cn2 += cx * cx
      if (i < nq)
        qc += cx * (if (isFloat) query.getFloat(i).toDouble else query.getDouble(i))
      i += 1
    }
    // c·r̂ and |r̂|² — per-block decoded lookups
    var cr = 0.0
    var rn2 = 0.0
    var b = 0
    while (b < m) {
      val code = codes(b) & 0xff
      rn2 += n2(b * ksub + code)
      val base = (b * ksub + code) * dsub
      var d = 0
      val lim = math.min(dsub, math.max(0, nc - b * dsub))
      if (isFloatC) while (d < lim) {
        cr += cvec.getFloat(b * dsub + d).toDouble * flat(base + d); d += 1
      } else while (d < lim) {
        cr += cvec.getDouble(b * dsub + d) * flat(base + d); d += 1
      }
      b += 1
    }
    val vn2 = cn2 + 2.0 * cr + rn2
    if (vn2 <= 0.0) Double.NegativeInfinity else (qc + qr) / math.sqrt(vn2)
  }
}

object PqKernel {
  /** ADC LUT entries cached per thread — sized for a broadcastable
    * query batch (see the lutCache note in [[PqKernel]]). */
  val DefaultLutEntries: Int = 64

  /** codebooks: m blocks × ksub centroids × dsub dims. `lutEntries`
    * overrides the per-thread ADC cache capacity (measurement
    * harnesses pass 1 to reproduce the single-entry behavior). */
  def build(codebooks: Seq[Seq[Seq[Double]]],
            lutEntries: Int = DefaultLutEntries): PqKernel = {
    require(codebooks.nonEmpty, "empty PQ codebooks")
    val m = codebooks.size
    val ksub = codebooks.head.size
    require(ksub >= 1 && ksub <= 256, s"ksub $ksub must fit one byte")
    val dsub = codebooks.head.head.size
    require(codebooks.forall(b => b.size == ksub && b.forall(_.size == dsub)),
      "ragged PQ codebooks: every block needs ksub × dsub entries")
    val flat = new Array[Double](m * ksub * dsub)
    var i = 0
    codebooks.foreach(_.foreach(_.foreach { x => flat(i) = x; i += 1 }))
    new PqKernel(m, ksub, dsub, flat, lutEntries)
  }
}

sealed trait PqExpression { self: Expression =>
  def codebooks: Seq[Seq[Seq[Double]]]
  @transient protected lazy val kernel: PqKernel = PqKernel.build(codebooks)
  protected def isFloatArray(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def kernelRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
}

/** vector → m-byte PQ code (binary). */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[ArrayData], isFloatArray(child))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kref.encode($c, ${isFloatArray(child)});")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** (queryVec, codes) → asymmetric dot against the reconstruction. */
case class PqAdcDot(left: Expression, right: Expression,
                    codebooks: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with PqExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  override def nullSafeEval(q: Any, codes: Any): Any =
    kernel.adcDot(q.asInstanceOf[ArrayData], isFloatArray(left),
      codes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = $kref.adcDot($q, ${isFloatArray(left)}, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDot = copy(left = newLeft, right = newRight)
}

/** (queryVec, codes) → reconstruction-normalized asymmetric dot — the
  * [[graft.functions.VectorOps.pqTopK]] candidate ranking. */
case class PqAdcCosine(left: Expression, right: Expression,
                       codebooks: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with PqExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine"

  override def nullSafeEval(q: Any, codes: Any): Any =
    kernel.adcCosine(q.asInstanceOf[ArrayData], isFloatArray(left),
      codes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = $kref.adcCosine($q, ${isFloatArray(left)}, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcCosine = copy(left = newLeft, right = newRight)
}

/** (vector, cellCentroid) → m-byte PQ code of the RESIDUAL v − c. */
case class PqResidualEncode(left: Expression, right: Expression,
                            codebooks: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with PqExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_residual_encode"

  override def nullSafeEval(vec: Any, cvec: Any): Any =
    kernel.encodeResidual(vec.asInstanceOf[ArrayData], isFloatArray(left),
      cvec.asInstanceOf[ArrayData], isFloatArray(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = $kref.encodeResidual($v, ${isFloatArray(left)}, " +
        s"$c, ${isFloatArray(right)});")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqResidualEncode =
    copy(left = newLeft, right = newRight)
}

/** (queryVec, codes, cellCentroid) → reconstruction-normalized
  * asymmetric dot in residual mode (v̂ = c + r̂) — the candidate
  * ranking of [[graft.lake.AnnIndex.topKJoinPq]] on a
  * residual-encoded index. */
case class PqResidualAdcCosine(first: Expression, second: Expression,
                               third: Expression,
                               codebooks: Seq[Seq[Seq[Double]]])
    extends TernaryExpression with PqExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_residual_adc_cosine"

  override def nullSafeEval(q: Any, codes: Any, cvec: Any): Any =
    kernel.adcCosineResidual(q.asInstanceOf[ArrayData], isFloatArray(first),
      codes.asInstanceOf[Array[Byte]],
      cvec.asInstanceOf[ArrayData], isFloatArray(third))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, (q, c, cv) =>
      s"${ev.value} = $kref.adcCosineResidual($q, ${isFloatArray(first)}, " +
        s"$c, $cv, ${isFloatArray(third)});")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqResidualAdcCosine =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqCodec {
  def pq_encode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), codebooks))

  def pq_adc_dot(query: Column, codes: Column,
                 codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqAdcDot(Bridge.expression(query), Bridge.expression(codes),
      codebooks))

  def pq_adc_cosine(query: Column, codes: Column,
                    codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqAdcCosine(Bridge.expression(query), Bridge.expression(codes),
      codebooks))

  def pq_residual_encode(vec: Column, cellCentroid: Column,
                         codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqResidualEncode(Bridge.expression(vec),
      Bridge.expression(cellCentroid), codebooks))

  def pq_residual_adc_cosine(query: Column, codes: Column,
                             cellCentroid: Column,
                             codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqResidualAdcCosine(Bridge.expression(query),
      Bridge.expression(codes), Bridge.expression(cellCentroid), codebooks))
}
