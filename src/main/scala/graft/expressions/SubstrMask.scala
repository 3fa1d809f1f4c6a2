package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact-substring-dedup masking kernel (q113's last stage): drop every
  * token covered by any duplicated K-window start, in ONE fused pass.
  *
  * `starts` must be ascending (q113 sorts it in the aggregation). A
  * token i is masked iff some start s ≤ i has s + k > i, so a single
  * two-pointer sweep — advance the start cursor while s ≤ i, carry the
  * max coverage end — decides every token in O(tokens + starts) and
  * joins the keepers as it goes.
  *
  * Replaces `filter(tokens, (_, i) => !exists(starts, …))`: higher-order
  * functions are CodegenFallback, so that shape re-evaluated the text
  * SPLIT per element reference and scanned `starts` per TOKEN —
  * O(tokens × starts) interpreted work that a boilerplate-heavy document
  * (thousands of duplicated windows) turns into seconds per row. Here
  * the split runs once and the sweep is a primitive loop inside
  * whole-stage codegen.
  *
  * Split semantics are split-on-single-space with empty words preserved
  * — identical to [[Shingles]] and to the concat_ws(" ", filter(…))
  * encoding it replaces (empty tokens between consecutive separators are
  * kept, and re-joined with single spaces), so the DuckDB oracle is
  * unchanged.
  *
  * Returns struct<clean_text: string, n_removed: bigint>.
  */
case class SubstrMask(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"window size $k must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))
  override def prettyName: String = "substr_mask"

  override def nullSafeEval(text: Any, starts: Any): Any =
    SubstrMask.compute(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.expressions.SubstrMask.compute($t, $s, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SubstrMask = copy(left = newLeft, right = newRight)
}

object SubstrMask {
  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, starts: ArrayData, k: Int): InternalRow = {
    val words = text.split(Space, -1)
    val nStarts = starts.numElements()
    val kept = new java.util.ArrayList[UTF8String](words.length)
    var sIdx = 0
    var prevStart = Integer.MIN_VALUE
    var coverEnd = -1 // exclusive end of the merged coverage so far
    var i = 0
    while (i < words.length) {
      while (sIdx < nStarts && starts.getInt(sIdx) <= i) {
        val st = starts.getInt(sIdx)
        // the sweep is only correct over ASCENDING starts — an unsorted
        // array would silently unmask covered tokens, so fail loudly
        if (st < prevStart) throw new IllegalArgumentException(
          s"substr_mask requires ascending starts ($st after $prevStart)")
        prevStart = st
        val end = st + k
        if (end > coverEnd) coverEnd = end
        sIdx += 1
      }
      if (i >= coverEnd) kept.add(words(i))
      i += 1
    }
    // starts beyond the last token never enter the sweep — finish the
    // ascending check over them, or an unsorted tail (which WOULD have
    // unmasked tokens had it sorted earlier) passes silently
    while (sIdx < nStarts) {
      val st = starts.getInt(sIdx)
      if (st < prevStart) throw new IllegalArgumentException(
        s"substr_mask requires ascending starts ($st after $prevStart)")
      prevStart = st
      sIdx += 1
    }
    val clean =
      if (kept.size == words.length) text // nothing masked: zero-copy
      else UTF8String.concatWs(Space, kept.toArray(new Array[UTF8String](kept.size)): _*)
    new GenericInternalRow(Array[Any](clean, (words.length - kept.size).toLong))
  }

  def substr_mask(text: Column, starts: Column, k: Int): Column =
    Bridge.column(SubstrMask(Bridge.expression(text),
      Bridge.expression(starts), k))
}
