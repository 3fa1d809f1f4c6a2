package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document reassembly minus SORTED dropped offsets, fused: the
  * line-dedup rebuild's
  * `concat_ws(" ", filter(chunks, (_, i) -> !array_contains(drops, i)))`
  * as one native two-pointer pass — O(chunks + drops) instead of the
  * HOF's O(chunks × drops) `array_contains` scan per kept chunk, and
  * the filter/contains/concat_ws triple collapses into a single
  * UTF8String append loop with no intermediate array.
  *
  * The majority-touched regime motivates it (r11 verdict: a
  * boilerplate-heavy corpus makes "touched" the majority and per-doc
  * drop lists long — the 30% skew twin's shape); `__ld_drop_idxs` is
  * already `sort_array`ed by [[graft.functions.TextOps.lineRebuild]],
  * which this kernel REQUIRES (ascending; out-of-order drops would
  * silently miss — the producer is in-engine, so the contract is
  * private). Value parity with the HOF encoding is spec-pinned
  * (including empty/all-dropped/none-dropped edges and duplicate
  * offsets, which both encodings ignore idempotently).
  */
case class ChunkRebuild(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "chunk_rebuild"

  // drops arrive as array<int> from posexplode's position or
  // array<bigint> from a long-typed producer — read with the right
  // accessor (an int array read through getLong returns garbage)
  private def dropsAreLong: Boolean =
    right.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.LongType

  override protected def nullSafeEval(chunks: Any, drops: Any): Any =
    ChunkRebuild.compute(chunks.asInstanceOf[ArrayData],
      drops.asInstanceOf[ArrayData], dropsAreLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, d) =>
      s"${ev.value} = graft.expressions.ChunkRebuild.compute($c, $d, $dropsAreLong);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ChunkRebuild =
    copy(left = newLeft, right = newRight)
}

object ChunkRebuild {
  private val Space = UTF8String.fromString(" ")

  /** Two-pointer merge over (chunks ascending by index, drops ascending
    * by value). Duplicate drop values advance the pointer without
    * effect; drop values outside [0, n) are ignored — exactly the
    * `!array_contains` semantics. */
  def compute(chunks: ArrayData, drops: ArrayData,
              dropsAreLong: Boolean): UTF8String = {
    val n = chunks.numElements()
    val d = drops.numElements()
    def drop(j: Int): Long =
      if (dropsAreLong) drops.getLong(j) else drops.getInt(j).toLong
    val kept = new Array[UTF8String](2 * n)
    var out = 0
    var j = 0
    var i = 0
    while (i < n) {
      while (j < d && drop(j) < i) j += 1
      if (j >= d || drop(j) != i) {
        if (out > 0) { kept(out) = Space; out += 1 }
        kept(out) = chunks.getUTF8String(i)
        out += 1
      }
      i += 1
    }
    if (out == 0) UTF8String.EMPTY_UTF8
    else UTF8String.concat(java.util.Arrays.copyOfRange(kept, 0, out): _*)
  }

  def chunk_rebuild(chunks: Column, drops: Column): Column =
    Bridge.column(ChunkRebuild(Bridge.expression(chunks),
      Bridge.expression(drops)))
}
