package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.AbstractDataType
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

import scala.collection.mutable.ArrayBuffer

/** Mergeable quantile sketch (SURVEY §2.5 A4/A7 at scale — the
  * percentile twin of [[Hll]]).
  *
  * `approx_percentile` answers one query over one scan; corpus statistics
  * at 100 TB (token-count distributions, document-length percentiles for
  * quality cutoffs) need a REUSABLE summary: per-partition sketches that
  * merge across partitions, AQE re-plans and RUNS, so each capture tick
  * folds its batch into `_state` without re-scanning history.
  *
  * Structure: a multilevel compactor in the Manku–Rajagopalan–Lindsay /
  * KLL family. Level i holds items of weight 2^i, capacity k per level;
  * a full level sorts, keeps alternate elements (compaction offset
  * alternates deterministically — reproducible runs, and the classic
  * ± rank-error analysis still applies), and promotes survivors one
  * level up. Rank error is O(log(n/k)/k) of total weight; k = 200 keeps
  * a billion-value sketch under ~60 levels × 200 doubles ≈ 100 KB worst
  * case (far less in practice — upper levels stay sparse).
  *
  * Quantile semantics: LOWER quantile — the smallest value whose
  * cumulative weight reaches ⌈q·W⌉ — matching the exact integer-rank
  * definition the oracle-checked q74 computes, so sketch estimates are
  * directly comparable to the exact query's output.
  */
object Qsk {

  val DefaultK = 200

  final class Sketch(val k: Int) {
    var n: Long = 0L
    var parity: Int = 0
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)

    def update(v: Double): Unit = {
      levels(0) += v
      n += 1
      compress()
    }

    private def compress(): Unit = {
      var i = 0
      while (i < levels.length) {
        if (levels(i).length >= k) compactLevel(i)
        i += 1
      }
    }

    private def compactLevel(i: Int): Unit = {
      val sorted = levels(i).sorted
      val off = parity & 1
      parity += 1
      if (i + 1 == levels.length) levels += ArrayBuffer.empty
      var j = off
      while (j < sorted.length) {
        levels(i + 1) += sorted(j)
        j += 2
      }
      levels(i).clear()
    }

    /** Merge, returning the combined sketch. An EMPTY side is identity
      * regardless of k — an empty batch's qsk_merge output (or an eval'd
      * None buffer) is a default-k empty sketch, and it must never crash
      * a fold into non-default-k state. Use the RETURN value: when this
      * side is empty the other sketch is returned (its k wins). */
    def merge(o: Sketch): Sketch = {
      if (o.n == 0) this
      else if (n == 0) o
      else {
        require(o.k == k, s"sketch k mismatch: $k vs ${o.k}")
        n += o.n
        var i = 0
        while (i < o.levels.length) {
          if (i == levels.length) levels += ArrayBuffer.empty
          levels(i) ++= o.levels(i)
          i += 1
        }
        compress()
        this
      }
    }

    /** Total retained weight (= n up to the ±1-item parity of odd
      * compactions). */
    def weight: Long = {
      var w = 0L
      var i = 0
      while (i < levels.length) {
        w += levels(i).length.toLong << i
        i += 1
      }
      w
    }

    /** Lower quantile: smallest value with cumulative weight ≥ ⌈q·W⌉. */
    def quantile(q: Double): Double = {
      require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")
      val items = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        levels(i).foreach(v => items += ((v, 1L << i)))
        i += 1
      }
      require(items.nonEmpty, "empty sketch has no quantiles")
      val sorted = items.sortBy(_._1)
      val w = sorted.iterator.map(_._2).sum
      val target = math.max(1L, math.ceil(q * w).toLong)
      var cum = 0L
      var j = 0
      while (j < sorted.length) {
        cum += sorted(j)._2
        if (cum >= target) return sorted(j)._1
        j += 1
      }
      sorted.last._1
    }

    def serialize(): Array[Byte] = {
      val nVals = levels.iterator.map(_.length).sum
      val b = java.nio.ByteBuffer.allocate(4 + 8 + 4 + 4 +
        4 * levels.length + 8 * nVals)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(k).putLong(n).putInt(parity).putInt(levels.length)
      levels.foreach(l => b.putInt(l.length))
      levels.foreach(_.foreach(b.putDouble))
      b.array()
    }
  }

  def empty(k: Int = DefaultK): Sketch = {
    require(k >= 8, s"k=$k too small")
    new Sketch(k)
  }

  def deserialize(bytes: Array[Byte]): Sketch = {
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val s = new Sketch(b.getInt())
    s.n = b.getLong()
    s.parity = b.getInt()
    val nLevels = b.getInt()
    val counts = Array.fill(nLevels)(b.getInt())
    var i = 0
    while (i < nLevels) {
      if (i == s.levels.length) s.levels += ArrayBuffer.empty
      var j = 0
      while (j < counts(i)) { s.levels(i) += b.getDouble(); j += 1 }
      i += 1
    }
    s
  }

  /** Byte-level merge for state-store accumulation. */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    deserialize(a).merge(deserialize(b)).serialize()
}

/** Aggregate: numeric values → sketch bytes (inputs implicit-cast to
  * DOUBLE, so the SQL surface takes any numeric column directly). */
case class QskSketchAgg(child: Expression, k: Int = Qsk.DefaultK,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Qsk.Sketch] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "qsk_sketch"

  override def createAggregationBuffer(): Qsk.Sketch = Qsk.empty(k)

  override def update(buf: Qsk.Sketch, input: InternalRow): Qsk.Sketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: Qsk.Sketch, other: Qsk.Sketch): Qsk.Sketch =
    buf.merge(other)

  override def eval(buf: Qsk.Sketch): Any = buf.serialize()
  override def serialize(buf: Qsk.Sketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Qsk.Sketch = Qsk.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QskSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QskSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QskSketchAgg =
    copy(child = c.head)
}

/** Aggregate: sketch bytes → merged sketch. */
case class QskMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[Qsk.Sketch]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "qsk_merge"

  override def createAggregationBuffer(): Option[Qsk.Sketch] = None

  override def update(buf: Option[Qsk.Sketch], input: InternalRow): Option[Qsk.Sketch] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = Qsk.deserialize(v.asInstanceOf[Array[Byte]])
      buf match {
        case None => Some(sk)
        case Some(b) => Some(b.merge(sk))
      }
    }
  }

  override def merge(buf: Option[Qsk.Sketch], other: Option[Qsk.Sketch]): Option[Qsk.Sketch] =
    (buf, other) match {
      case (Some(a), Some(b)) => Some(a.merge(b))
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buf: Option[Qsk.Sketch]): Any =
    buf.getOrElse(Qsk.empty()).serialize()
  // None must survive a serde round-trip as None: a zero-row partial
  // buffer serialized as a default-k sketch would merge-crash against
  // sketches built with a non-default k.
  override def serialize(buf: Option[Qsk.Sketch]): Array[Byte] =
    buf.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[Qsk.Sketch] =
    if (bytes.isEmpty) None else Some(Qsk.deserialize(bytes))

  override def withNewMutableAggBufferOffset(o: Int): QskMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QskMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QskMergeAgg =
    copy(child = c.head)
}

/** Scalar: (sketch bytes, q) → lower-quantile estimate; NULL for an
  * empty sketch (an empty/all-NULL aggregation), matching
  * approx_percentile. Interpreted — evaluated per group of sketches,
  * not per data row. */
case class QskQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "qsk_quantile"
  override protected def nullSafeEval(sk: Any, q: Any): Any = {
    val sketch = Qsk.deserialize(sk.asInstanceOf[Array[Byte]])
    if (sketch.levels.forall(_.isEmpty)) null
    else sketch.quantile(q.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QskQuantile =
    copy(left = l, right = r)
}

object QuantileSketch {

  private def agg[T](f: TypedImperativeAggregate[T]): Column =
    Bridge.column(f.toAggregateExpression())

  /** `df.agg(qsk_sketch($"v"))` → binary sketch (input cast to double). */
  def qsk_sketch(c: Column, k: Int = Qsk.DefaultK): Column =
    agg(QskSketchAgg(Bridge.expression(c.cast("double")), k))

  /** `df.agg(qsk_merge($"sketch"))` → merged binary sketch. */
  def qsk_merge(c: Column): Column = agg(QskMergeAgg(Bridge.expression(c)))

  /** `qsk_quantile($"sketch", lit(0.5))` → Double estimate. */
  def qsk_quantile(sk: Column, q: Column): Column =
    Bridge.column(QskQuantile(Bridge.expression(sk), Bridge.expression(q)))
}
