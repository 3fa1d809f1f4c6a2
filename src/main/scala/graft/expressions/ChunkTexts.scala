package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-size token chunks with overlap as one native expression —
  * chunk i covers tokens [i·(chunk−overlap), i·(chunk−overlap)+chunk),
  * chunk count ⌈(n−overlap)/step⌉ (≥1, so an empty text still yields
  * one empty chunk; a trailing start inside the previous chunk's
  * overlap region would emit a strict-subset chunk — silently
  * duplicated training data).
  *
  * Replaces the `transform(sequence(…), i => array_join(slice(split(
  * text), …)))` encoding: higher-order functions are CodegenFallback
  * and the interpreted lambda re-evaluates the text SPLIT per chunk —
  * O(tokens²/step) per document, the [[Shingles]] trap again. Here the
  * split runs once and each chunk is one join over a word slice.
  * Split semantics are split-on-single-space with empty words
  * preserved, identical to [[Shingles]]/[[SubstrMask]] and to the
  * DuckDB oracles.
  */
case class ChunkTexts(child: Expression, chunkTokens: Int, overlap: Int)
    extends UnaryExpression {
  require(overlap >= 0 && overlap < chunkTokens,
    s"overlap $overlap must be in [0, $chunkTokens)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_texts"

  override protected def nullSafeEval(input: Any): Any =
    ChunkTexts.compute(input.asInstanceOf[UTF8String], chunkTokens, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ChunkTexts.compute($c, $chunkTokens, $overlap);")

  override protected def withNewChildInternal(newChild: Expression): ChunkTexts =
    copy(child = newChild)
}

object ChunkTexts {
  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, chunkTokens: Int, overlap: Int): ArrayData = {
    val words = text.split(Space, -1)
    val step = chunkTokens - overlap
    // Spark integer division semantics (truncation toward zero) — the
    // HOF encoding this replaces computed ((n-overlap)+step-1)/step
    val raw = (words.length - overlap + step - 1) / step
    val nChunks = math.max(1, raw)
    val out = new Array[Any](nChunks)
    var i = 0
    while (i < nChunks) {
      val from = i * step
      val until = math.min(words.length, from + chunkTokens)
      if (from >= until) out(i) = UTF8String.EMPTY_UTF8
      else {
        val slice = java.util.Arrays.copyOfRange(words, from, until)
        out(i) = UTF8String.concatWs(Space, slice: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def chunk_texts(c: Column, chunkTokens: Int, overlap: Int): Column =
    Bridge.column(ChunkTexts(Bridge.expression(c), chunkTokens, overlap))
}
