package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as one native expression: text → array of
  * space-joined n-word shingles (L−n+1 of them; empty when L < n).
  *
  * Plan-shape win, not micro-optimization: the composable encoding
  * (split → posexplode → lead window → concat) must SHUFFLE AND SORT
  * every word occurrence of the corpus to line up the n-gram neighbors,
  * because lead() needs per-doc ordered partitions. Producing the
  * shingle array inside the scan keeps the whole signature pipeline
  * map-side: explode(shingles) → partial min-agg, so the only shuffle
  * carries 8 hashes per document instead of every word of 100 TB.
  * Semantics match split-on-single-space of both engines (consecutive
  * separators yield empty words), so the DuckDB oracles are unchanged.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size $n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Shingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(Space, -1)
    val count = words.length - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        var s = words(i)
        var j = 1
        while (j < n) {
          s = UTF8String.concat(s, Space, words(i + j))
          j += 1
        }
        out(i) = s
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def shingles(c: Column, n: Int): Column =
    Bridge.column(Shingles(Bridge.expression(c), n))
}
