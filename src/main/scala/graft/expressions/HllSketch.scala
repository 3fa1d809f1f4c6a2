package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable HyperLogLog sketch (SURVEY §2.5 A4 at scale).
  *
  * `approx_count_distinct` gives an estimate but not a REUSABLE sketch:
  * the reference's uniqueness checks run per capture tick, and at 100 TB
  * you cannot re-scan history each tick. These aggregates emit/merge the
  * sketch itself (a self-describing byte array: [precision, m registers])
  * so per-run sketches persist in `_state` and cross-run cardinality is a
  * byte-wise max-merge of two 4 KiB buffers — the classic
  * Flajolet–Fusy–Gandouet–Meunier estimator with linear-counting
  * small-range correction.
  *
  * Merge is lossless by construction: register-wise max commutes with
  * stream union, so sketch(A) ⊔ sketch(B) == sketch(A ∪ B) exactly
  * (property-tested), making the aggregate safe for partial aggregation,
  * AQE re-planning and cross-run accumulation alike.
  */
object Hll {

  val DefaultP = 12 // 4096 registers ⇒ ~1.04/√m ≈ 1.6% standard error

  def empty(p: Int = DefaultP): Array[Byte] = {
    require(p >= 4 && p <= 16, s"precision $p out of [4,16]")
    val a = new Array[Byte](1 + (1 << p))
    a(0) = p.toByte
    a
  }

  /** Fold one 64-bit hash into the sketch: top p bits pick the register,
    * the rank of the remaining bits (leading-zeros + 1) is max'd in. */
  def update(sketch: Array[Byte], hash: Long): Unit = {
    val p = sketch(0).toInt
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rho = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > sketch(1 + idx)) sketch(1 + idx) = rho.toByte
  }

  /** True iff no value was ever folded in (all registers zero). */
  def isZero(sketch: Array[Byte]): Boolean = {
    var i = 1
    while (i < sketch.length) {
      if (sketch(i) != 0) return false
      i += 1
    }
    true
  }

  /** Register-wise max, in place into `a` (use the return value). A
    * ZERO sketch is identity regardless of precision: an empty batch's
    * hll_merge output carries the default p, and folding it into
    * non-default-p state must be a no-op, not a crash. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a(0) != b(0)) {
      if (isZero(b)) return a
      if (isZero(a)) return b.clone()
      require(a(0) == b(0), s"precision mismatch: ${a(0)} vs ${b(0)}")
    }
    var i = 1
    while (i < a.length) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  def estimate(sketch: Array[Byte]): Long = {
    val p = sketch(0).toInt
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = sketch(1 + i).toInt
      sum += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }
}

/** Aggregate: values → sketch bytes. Buffer IS the serialized form, so
  * partial-aggregate shuffle serialization is a no-op copy. */
case class HllSketchAgg(child: Expression, precision: Int = Hll.DefaultP,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = Hll.empty(precision)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.update(buf, XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.merge(buf, other)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c.head)
}

/** Aggregate: sketch bytes → merged sketch (re-aggregation across
  * partitions/runs/groups without touching raw data). */
case class HllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_merge"

  // empty-until-first-input: precision adopts the first sketch seen
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) sk.clone() else Hll.merge(buf, sk)
    }
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other.clone()
    else Hll.merge(buf, other)

  override def eval(buf: Array[Byte]): Any =
    if (buf.isEmpty) Hll.empty() else buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = c.head)
}

/** Scalar: sketch bytes → cardinality estimate. Evaluated once per
  * group/row of sketches — not a hot-path expression, so interpreted
  * (CodegenFallback) is the right trade. */
case class HllEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_estimate"
  override protected def nullSafeEval(v: Any): Any =
    Hll.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): HllEstimate =
    copy(child = c)
}

object HllSketch {
  import org.apache.spark.sql.catalyst.expressions.aggregate.Complete

  private def agg(f: TypedImperativeAggregate[Array[Byte]]): Column =
    Bridge.column(f.toAggregateExpression())

  /** Column API: `df.agg(hll_sketch($"id"))` → binary sketch. */
  def hll_sketch(c: Column, precision: Int = Hll.DefaultP): Column =
    agg(HllSketchAgg(Bridge.expression(c), precision))

  /** `df.agg(hll_merge($"sketch"))` → merged binary sketch. */
  def hll_merge(c: Column): Column = agg(HllMergeAgg(Bridge.expression(c)))

  /** `hll_estimate($"sketch")` → Long cardinality. */
  def hll_estimate(c: Column): Column =
    Bridge.column(HllEstimate(Bridge.expression(c)))
}
