package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Share of all word n-grams taken by the single most frequent one —
  * the Gopher-style repetition signal — as one native O(tokens) pass:
  * split once, count n-grams in a hash map, return max/total (0.0 when
  * the text is shorter than n words).
  *
  * Replaces `array_max(transform(array_distinct(g), x => size(filter(
  * g, _ === x)))) / size(g)`: the interpreted lambda re-built the
  * whole shingle ARRAY per distinct n-gram — O(distinct × tokens) per
  * document, quadratic on diverse text (the [[Shingles]] trap in its
  * counting form). N-gram construction matches [[Shingles]]
  * (split-on-single-space, L−n+1 windows), so the fraction is
  * bit-identical to the HOF encoding and the DuckDB oracle.
  */
case class TopNgramFrac(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size $n must be >= 1")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_ngram_frac"

  override protected def nullSafeEval(input: Any): Any =
    TopNgramFrac.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TopNgramFrac.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TopNgramFrac =
    copy(child = newChild)
}

object TopNgramFrac {
  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): Double = {
    val words = text.split(Space, -1)
    val count = words.length - n + 1
    if (count <= 0) return 0.0
    val freq = new java.util.HashMap[UTF8String, Int](count * 2)
    var maxC = 0
    var i = 0
    while (i < count) {
      var s = words(i)
      var j = 1
      while (j < n) { s = UTF8String.concat(s, Space, words(i + j)); j += 1 }
      val c = freq.merge(s, 1, (a, b) => a + b)
      if (c > maxC) maxC = c
      i += 1
    }
    maxC.toDouble / count
  }

  def top_ngram_frac(c: Column, n: Int): Column =
    Bridge.column(TopNgramFrac(Bridge.expression(c), n))
}
