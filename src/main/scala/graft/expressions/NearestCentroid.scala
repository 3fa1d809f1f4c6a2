package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Fused nearest-centroid assignment over a broadcast centroid table —
  * the k ∝ n scale path of [[graft.functions.VectorOps.assignClusters]]/
  * [[graft.functions.VectorOps.assignClustersMulti]] as ONE native,
  * codegen'd expression.
  *
  * The k > LiteralCentroidMaxK shape it replaces shipped the centroids
  * as a `typedLit` array scored by a higher-order `transform` whose
  * lambda ran [[VecDot]]'s INTERPRETED eval per element: every corpus
  * row paid k interpreted closure invocations with per-element struct
  * boxing — on SemDeDup's hot path, where k grows with the corpus
  * (k = n/500). Here the whole ranking is one generated-code call into
  * a [[CentroidKernel]] holding the centroids as a flat primitive
  * array (shipped once per executor via the codegen reference array —
  * the same wire cost as the typedLit task binary), so the k·dim FLOPs
  * run as a tight primitive loop and the projection stays inside
  * whole-stage codegen at ANY k.
  *
  * ARITHMETIC PARITY (spec-pinned against both prior shapes): the
  * ranking quantity is |c|² − 2·v·c — n2 summed left-to-right over the
  * centroid, the dot summed in index order over min(len(v), dim) with
  * float elements widened to double BEFORE the multiply ([[VecDot]]'s
  * convention) — and ties break to the smaller cluster id, matching
  * `array_min`/`sort_array` over struct<d, c> (java.lang.Double.compare
  * ordering: NaN sorts greatest, so an all-NaN row falls back to
  * cluster 0 on every path).
  */
final class CentroidKernel(val flat: Array[Double], val k: Int, val dim: Int,
                           val n2: Array[Double]) extends Serializable {

  /** d(c) = |c|² − 2·v·c for one centroid — the per-row |v|² constant
    * is dropped on every path, it cannot change the ranking. */
  private def distRel(vec: ArrayData, isFloat: Boolean, c: Int): Double = {
    val base = c * dim
    val m = math.min(vec.numElements(), dim)
    var dot = 0.0
    var i = 0
    if (isFloat) while (i < m) { dot += vec.getFloat(i).toDouble * flat(base + i); i += 1 }
    else while (i < m) { dot += vec.getDouble(i) * flat(base + i); i += 1 }
    n2(c) - 2.0 * dot
  }

  /** (d1, c1) < (d2, c2) under Spark's struct<double, int> ordering. */
  private def lt(d1: Double, c1: Int, d2: Double, c2: Int): Boolean = {
    val cmp = java.lang.Double.compare(d1, d2)
    cmp < 0 || (cmp == 0 && c1 < c2)
  }

  def nearest(vec: ArrayData, isFloat: Boolean): Int = {
    var bestC = 0
    var bestD = distRel(vec, isFloat, 0)
    var c = 1
    while (c < k) {
      val d = distRel(vec, isFloat, c)
      if (lt(d, c, bestD, bestC)) { bestD = d; bestC = c }
      c += 1
    }
    bestC
  }

  /** First `take` cluster ids ascending by (score, c) — the order
    * `slice(sort_array(...), 1, n)` emits. take is small (multi-probe
    * blocking / nprobe, 2–8), so repeated selection is O(k·take) with
    * zero allocation beyond the two k-sized scratch arrays. */
  private def selectAsc(scores: Array[Double], take: Int): ArrayData = {
    val m = math.min(take, k)
    val out = new Array[Any](m)
    val used = new Array[Boolean](k)
    var s = 0
    while (s < m) {
      var bestC = -1
      var bestD = 0.0
      var c = 0
      while (c < k) {
        if (!used(c) && (bestC == -1 || lt(scores(c), c, bestD, bestC))) {
          bestD = scores(c); bestC = c
        }
        c += 1
      }
      used(bestC) = true
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The min(nAssign, k) nearest clusters, ascending by (d, c). */
  def nearestMulti(vec: ArrayData, isFloat: Boolean, nAssign: Int): ArrayData = {
    val ds = new Array[Double](k)
    var c = 0
    while (c < k) { ds(c) = distRel(vec, isFloat, c); c += 1 }
    selectAsc(ds, nAssign)
  }

  /** The min(nprobe, k) clusters ranked by COSINE to the query vector —
    * descending cosine, cluster-ascending ties: the IVF probe order
    * ([[graft.lake.AnnIndex.topKJoin]]). Scoring parity with the
    * expression shape it replaces: score = −round(dot/√(|c|²·|v|²), 4)
    * ranked ascending, with Spark Round semantics (HALF_UP on the
    * canonical decimal rendering; NaN/±Inf pass through) — so a
    * zero-norm centroid's NaN sorts LAST. One DELIBERATE divergence
    * from the retired SQL shape: on a zero-norm centroid or query the
    * raw division threw under ANSI (DIVIDE_BY_ZERO), where this
    * kernel's 0/0 is a plain NaN that ranks the degenerate entry
    * last. Unobservable on the production path — topKJoin's exact
    * scoring stage still divides by the stored norms in SQL and fails
    * loudly on zero-norm vectors, the engine-wide posture — but probe
    * SELECTION no longer falls over before that check is reached. */
  def topCosine(vec: ArrayData, isFloat: Boolean, nprobe: Int): ArrayData = {
    val n = vec.numElements()
    var qn2 = 0.0
    var i = 0
    if (isFloat) while (i < n) { val x = vec.getFloat(i).toDouble; qn2 += x * x; i += 1 }
    else while (i < n) { val x = vec.getDouble(i); qn2 += x * x; i += 1 }
    val ds = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * dim
      val m = math.min(n, dim)
      var dot = 0.0
      i = 0
      if (isFloat) while (i < m) { dot += vec.getFloat(i).toDouble * flat(base + i); i += 1 }
      else while (i < m) { dot += vec.getDouble(i) * flat(base + i); i += 1 }
      ds(c) = -CentroidKernel.round4(dot / math.sqrt(n2(c) * qn2))
      c += 1
    }
    selectAsc(ds, nprobe)
  }
}

object CentroidKernel {

  /** Spark `Round(_, 4)` parity for doubles: NaN/±Inf pass through,
    * everything else rounds HALF_UP over the canonical decimal
    * rendering (java BigDecimal.valueOf) — the exact eval path of the
    * builtin, so kernel scores are bit-identical to `round(col, 4)`.
    *
    * Fast path: when |x|·10⁴ sits safely away from a .5 boundary
    * (margin 1e-6, ≥45× the combined multiply + shortest-decimal
    * representation error of ~|x|·10⁴·2⁻⁵¹, which the |x|·10⁴ < 10⁸
    * gate caps at ~4e-8), binary and decimal rounding provably agree,
    * so plain scaled-integer arithmetic answers with ZERO allocation — the BigDecimal path (one BigDecimal + one
    * BigInteger per call, measured 2–4× slower per probe at k ≥ 128)
    * runs only for boundary-adjacent values, which have ~0 measure on
    * real cosine scores. Parity is by construction: any value where
    * the two COULD disagree takes the exact path. The final n/10⁴
    * division is a single correctly-rounded IEEE op, identical to
    * BigDecimal.doubleValue() on the same 4-dp decimal. */
  def round4(x: Double): Double = {
    if (x.isNaN || x.isInfinite) return x
    val s = x * 1e4
    val a = math.abs(s)
    if (a < 1e8) {
      val fl = math.floor(a)
      val frac = a - fl
      if (math.abs(frac - 0.5) > 1e-6) {
        val r = if (frac > 0.5) fl + 1.0 else fl
        // BigDecimal never yields -0.0 — a negative rounding to zero
        // must come back as POSITIVE zero for bit-parity
        return if (r == 0.0) 0.0 else (if (s < 0) -r else r) / 1e4
      }
    }
    round4Exact(x)
  }

  /** The reference implementation (Spark Round's own eval path) —
    * kept callable for the parity spec. */
  def round4Exact(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  def build(cents: Seq[Seq[Double]]): CentroidKernel = {
    require(cents.nonEmpty, "empty centroid table")
    val k = cents.size
    val dim = cents.head.size
    require(cents.forall(_.size == dim),
      s"ragged centroid table: expected every centroid to have dim $dim")
    val flat = new Array[Double](k * dim)
    val n2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      var i = 0
      var s = 0.0
      var x = 0.0
      // left-to-right: .map(x => x*x).sum parity on the prior shapes
      while (i < dim) { x = cv(i); flat(c * dim + i) = x; s += x * x; i += 1 }
      n2(c) = s
      c += 1
    }
    new CentroidKernel(flat, k, dim, n2)
  }
}

/** Shared shape of the two assignment expressions: a numeric-array
  * child scored against a plan-constant centroid table. Centroids are
  * stored STRUCTURALLY (Seq of Seq) so expression equality and
  * canonicalization work; the executor-side kernel is a transient lazy
  * rebuild (interpreted eval) or a serialized codegen reference. */
sealed trait CentroidExpression extends UnaryExpression {
  def cents: Seq[Seq[Double]]
  @transient protected lazy val kernel: CentroidKernel = CentroidKernel.build(cents)
  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def kernelRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("centKernel", kernel, classOf[CentroidKernel].getName)
}

/** Nearest cluster id (int) — [[graft.functions.VectorOps.assignClusters]]'
  * k-unbounded plan shape. */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
    extends CentroidExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    kernel.nearest(input.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kref.nearest($c, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** The nAssign nearest cluster ids (array<int>, ascending by distance)
  * — [[graft.functions.VectorOps.assignClustersMulti]]'s multi-probe
  * blocking at unbounded k. */
case class NearestCentroids(child: Expression, cents: Seq[Seq[Double]],
                            nAssign: Int) extends CentroidExpression {
  require(nAssign >= 1, s"nAssign must be >= 1, got $nAssign")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(input: Any): Any =
    kernel.nearestMulti(input.asInstanceOf[ArrayData], elemIsFloat, nAssign)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kref.nearestMulti($c, $elemIsFloat, $nAssign);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** The nprobe clusters nearest by COSINE (array<int>, descending
  * cosine) — [[graft.lake.AnnIndex.topKJoin]]'s map-side probe
  * selection at unbounded k. */
case class TopCosineCentroids(child: Expression, cents: Seq[Seq[Double]],
                              nprobe: Int) extends CentroidExpression {
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cosine_centroids"

  override protected def nullSafeEval(input: Any): Any =
    kernel.topCosine(input.asInstanceOf[ArrayData], elemIsFloat, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kref.topCosine($c, $elemIsFloat, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCosineCentroids =
    copy(child = newChild)
}

object NearestCentroid {
  def nearest_centroid(vec: Column, cents: Seq[Array[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec),
      cents.map(_.toIndexedSeq)))

  def nearest_centroids(vec: Column, cents: Seq[Array[Double]],
                        nAssign: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(vec),
      cents.map(_.toIndexedSeq), nAssign))

  def top_cosine_centroids(vec: Column, cents: Seq[Array[Double]],
                           nprobe: Int): Column =
    Bridge.column(TopCosineCentroids(Bridge.expression(vec),
      cents.map(_.toIndexedSeq), nprobe))
}
