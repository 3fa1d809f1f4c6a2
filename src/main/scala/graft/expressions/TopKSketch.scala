package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.AbstractDataType
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Mergeable heavy-hitters sketch — Misra–Gries summaries, the frequent-
  * items member of the engine's sketch family ([[Hll]] distinct counts,
  * [[Qsk]] quantiles, this for top-k).
  *
  * Exact corpus top-k (q79) shuffles the full vocabulary every run; at
  * 100 TB the REUSABLE summary is a k-counter Misra–Gries sketch built
  * per partition, merged across partitions and runs
  * ([[graft.state.StateStore.mergeTopK]]) — so "what are the corpus's
  * dominant tokens" folds each capture tick into `_state` in O(k) space
  * without ever re-scanning history.
  *
  * Guarantees (classic MG, and Agarwal et al.'s mergeable-summaries
  * merge): every estimate undercounts, `true − n/(k+1) ≤ est ≤ true`,
  * where n is the TOTAL stream weight across every update and merge —
  * any token with frequency above n/(k+1) is guaranteed present. The
  * merge sums counters then subtracts the (k+1)-th largest count from
  * all (dropping ≤ 0), which keeps the additive error within the sum of
  * the parts' errors — merge order never affects the bound.
  */
object Mg {

  val DefaultK = 64

  final class Sketch(val k: Int) {
    var n: Long = 0L
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def update(t: String): Unit = {
      n += 1
      counts.get(t) match {
        case Some(c) => counts.update(t, c + 1)
        case None if counts.size < k => counts.update(t, 1L)
        case None => // decrement-all round: k counters + the new item
          val dead = List.newBuilder[String]
          counts.foreach { case (tok, c) =>
            if (c == 1L) dead += tok else counts.update(tok, c - 1)
          }
          dead.result().foreach(counts.remove)
      }
    }

    /** Merge, returning the combined sketch. An EMPTY side is identity
      * regardless of k (same contract as [[Qsk.Sketch.merge]] — an
      * empty batch must never k-mismatch-crash a fold into state); use
      * the RETURN value. */
    def merge(o: Sketch): Sketch = {
      if (o.n == 0) this
      else if (n == 0) o
      else {
        require(o.k == k, s"sketch k mismatch: $k vs ${o.k}")
        n += o.n
        o.counts.foreach { case (t, c) =>
          counts.update(t, counts.getOrElse(t, 0L) + c)
        }
        if (counts.size > k) {
          val vs = counts.values.toArray
          java.util.Arrays.sort(vs)
          val cut = vs(vs.length - k - 1) // (k+1)-th largest
          val dead = List.newBuilder[String]
          counts.foreach { case (t, c) =>
            if (c <= cut) dead += t else counts.update(t, c - cut)
          }
          dead.result().foreach(counts.remove)
        }
        this
      }
    }

    def estimate(t: String): Long = counts.getOrElse(t, 0L)

    /** Top-m surviving counters, count-descending, token tiebreak. */
    def topK(m: Int): Seq[(String, Long)] =
      counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(m)

    def serialize(): Array[Byte] = {
      val entries = counts.toSeq.sortBy(_._1) // canonical byte form
      val bytes = entries.map { case (t, _) => t.getBytes("UTF-8") }
      val size = 4 + 8 + 4 + bytes.map(_.length + 4 + 8).sum
      val b = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(k).putLong(n).putInt(entries.length)
      entries.zip(bytes).foreach { case ((_, c), tb) =>
        b.putInt(tb.length).put(tb).putLong(c)
      }
      b.array()
    }
  }

  def empty(k: Int = DefaultK): Sketch = {
    require(k >= 2, s"k=$k too small")
    new Sketch(k)
  }

  def deserialize(bytes: Array[Byte]): Sketch = {
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val s = new Sketch(b.getInt())
    s.n = b.getLong()
    val size = b.getInt()
    var i = 0
    while (i < size) {
      val tb = new Array[Byte](b.getInt())
      b.get(tb)
      s.counts.update(new String(tb, "UTF-8"), b.getLong())
      i += 1
    }
    s
  }

  /** Byte-level merge for state-store accumulation. */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    deserialize(a).merge(deserialize(b)).serialize()
}

/** Aggregate: string values → sketch bytes. */
case class MgSketchAgg(child: Expression, k: Int = Mg.DefaultK,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Mg.Sketch] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_sketch"

  override def createAggregationBuffer(): Mg.Sketch = Mg.empty(k)

  override def update(buf: Mg.Sketch, input: InternalRow): Mg.Sketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: Mg.Sketch, other: Mg.Sketch): Mg.Sketch =
    buf.merge(other)

  override def eval(buf: Mg.Sketch): Any = buf.serialize()
  override def serialize(buf: Mg.Sketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Mg.Sketch = Mg.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MgSketchAgg =
    copy(child = c.head)
}

/** Aggregate: sketch bytes → merged sketch. None buffers serde as empty
  * bytes (the [[QskMergeAgg]] lesson — a zero-row partial must not
  * manufacture a default-k sketch). */
case class MgMergeAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[Mg.Sketch]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_merge"

  override def createAggregationBuffer(): Option[Mg.Sketch] = None

  override def update(buf: Option[Mg.Sketch], input: InternalRow): Option[Mg.Sketch] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = Mg.deserialize(v.asInstanceOf[Array[Byte]])
      buf match {
        case None => Some(sk)
        case Some(b) => Some(b.merge(sk))
      }
    }
  }

  override def merge(buf: Option[Mg.Sketch], other: Option[Mg.Sketch]): Option[Mg.Sketch] =
    (buf, other) match {
      case (Some(a), Some(b)) => Some(a.merge(b))
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buf: Option[Mg.Sketch]): Any =
    buf.getOrElse(Mg.empty()).serialize()
  override def serialize(buf: Option[Mg.Sketch]): Array[Byte] =
    buf.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[Mg.Sketch] =
    if (bytes.isEmpty) None else Some(Mg.deserialize(bytes))

  override def withNewMutableAggBufferOffset(o: Int): MgMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MgMergeAgg =
    copy(child = c.head)
}

/** Scalar: (sketch bytes, m) → map<token, count> of the top-m counters
  * (count-descending, token tiebreak — map keys preserve insertion
  * order in Spark). Empty sketch → empty map; NULL sketch → NULL (the
  * BinaryExpression default null-propagation — nullable must say so or
  * NullPropagation folds `IS NOT NULL` checks to true). Interpreted —
  * evaluated once per sketch, not per data row. */
case class MgTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "mg_topk"
  override protected def nullSafeEval(sk: Any, m: Any): Any = {
    val top = Mg.deserialize(sk.asInstanceOf[Array[Byte]])
      .topK(m.asInstanceOf[Int])
    new ArrayBasedMapData(
      new GenericArrayData(top.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(top.map(e => e._2).toArray[Any]))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MgTopK =
    copy(left = l, right = r)
}

object TopKSketch {

  private def agg[T](f: TypedImperativeAggregate[T]): Column =
    Bridge.column(f.toAggregateExpression())

  /** `df.agg(mg_sketch($"token"))` → binary sketch. */
  def mg_sketch(c: Column, k: Int = Mg.DefaultK): Column =
    agg(MgSketchAgg(Bridge.expression(c), k))

  /** `df.agg(mg_merge($"sketch"))` → merged binary sketch. */
  def mg_merge(c: Column): Column = agg(MgMergeAgg(Bridge.expression(c)))

  /** `mg_topk($"sketch", lit(10))` → map<token, count>. */
  def mg_topk(sk: Column, m: Column): Column =
    Bridge.column(MgTopK(Bridge.expression(sk), Bridge.expression(m)))
}
