package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass quality-signal counters: text → struct(n_char, n_tok,
  * stop_hits, non_alnum), all longs.
  *
  * Scan-constant win for the quality gate (the filter every document of
  * 100 TB passes through): the composable encoding costs ~6 regex
  * passes per row — four `regexp_replace` length-diffs for the stopword
  * hits, one `[^a-zA-Z0-9 ]` strip, one separator strip — while this
  * expression derives every count in one walk over the UTF-8 bytes.
  * The FINAL ratio/score arithmetic deliberately stays in ordinary
  * Column expressions over these integer fields, value-identical to the
  * regex formulation (and to the DuckDB oracles):
  *
  *  - n_char    = length(text)              (characters, not bytes);
  *  - n_tok     = size(split(text, ' '))    = single-space separators+1
  *                (consecutive separators yield empty tokens, as both
  *                engines' split does);
  *  - stop_hits = Σ occurrences of " stop " in " text " — matched
  *                non-overlapping left-to-right advancing PAST each
  *                match's trailing space, replicating the
  *                regexp_replace length-diff counting exactly
  *                (adjacent repeats like "a a" count once);
  *  - non_alnum = characters outside [a-zA-Z0-9 ] (every non-ASCII
  *                character counts 1, like the regex class).
  *
  * ASCII needles/classes are matched on raw bytes — sound in UTF-8,
  * where continuation bytes never collide with ASCII — and character
  * counts come from counting non-continuation bytes in the same walk.
  */
case class TextStats(child: Expression, stops: Seq[String])
    extends UnaryExpression {
  require(stops.nonEmpty && stops.forall(s => s.nonEmpty && s.forall(_ < 128)),
    "stopwords must be non-empty ASCII")

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  @transient private lazy val needles = TextStats.needlesOf(stops)

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], needles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("needles", needles, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextStats.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  val schema: StructType = StructType(Seq(
    StructField("n_char", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("non_alnum", LongType, nullable = false)))

  def needlesOf(stops: Seq[String]): Array[Array[Byte]] =
    stops.map(s => s" $s ".getBytes("US-ASCII")).toArray

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, needles: Array[Array[Byte]]): InternalRow = {
    val bytes = text.getBytes
    val len = bytes.length
    var nChar = 0L; var nSpace = 0L; var nonAlnum = 0L
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if ((b & 0xC0) != 0x80) { // char start (ASCII or UTF-8 lead byte)
        nChar += 1
        if (b == ' ') nSpace += 1
        else if (!((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
                   (b >= '0' && b <= '9'))) nonAlnum += 1
      }
      i += 1
    }
    // " stop " occurrences in " text ": virtual one-space padding on
    // both sides; on a match the cursor jumps past the whole needle
    // (the trailing space is CONSUMED, as the regex engine's scan does)
    var hits = 0L
    var n = 0
    while (n < needles.length) {
      val needle = needles(n)
      val nl = needle.length
      var pos = -1 // index into the padded view [-1, len]
      while (pos + nl <= len + 1) {
        var j = 0
        var ok = true
        while (ok && j < nl) {
          val p = pos + j
          val c: Byte = if (p == -1 || p == len) ' ' else bytes(p)
          if (c != needle(j)) ok = false
          j += 1
        }
        // on a match the scan resumes AFTER the full match (trailing
        // space consumed), so adjacent repeats like "a a" count once —
        // exactly Matcher.find's non-overlapping advance
        if (ok) { hits += 1; pos += nl } else pos += 1
      }
      n += 1
    }
    new GenericInternalRow(Array[Any](nChar, nSpace + 1L, hits, nonAlnum))
  }

  def textStats(c: Column, stops: Seq[String]): Column =
    Bridge.column(TextStats(Bridge.expression(c), stops))
}
