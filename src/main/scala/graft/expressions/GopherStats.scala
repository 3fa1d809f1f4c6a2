package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass counters for the Gopher document-quality rules (Rae et al.
  * 2021 §A1.1, the rule set carried into MassiveText/RefinedWeb/FineWeb
  * curation): text → struct of longs
  *
  *  - n_words        whitespace words (maximal runs of non-space,
  *                   non-newline bytes — empty tokens from consecutive
  *                   separators don't count);
  *  - word_chars     total characters across words (mean word length
  *                   = word_chars / n_words);
  *  - alpha_words    words containing ≥1 ASCII letter;
  *  - n_lines        newline count + 1 (split semantics);
  *  - bullet_lines   lines whose first non-space char is '-' or '*';
  *  - ellipsis_lines lines whose space-rtrimmed tail is "...";
  *  - hash_chars     '#' characters (symbol-to-word ratio rule);
  *  - ellipsis_runs  non-overlapping "..." occurrences (⌊run/3⌋ per
  *                   dot-run — exactly replace()'s left-to-right
  *                   consumption, so the DuckDB length-diff oracle
  *                   counts the same);
  *  - stop_present   DISTINCT members of the fixed 8-stopword list
  *                   ("the be to of and that have with") occurring as
  *                   whole words (the "≥ 2 of 8" rule).
  *
  * The composable encoding costs a split-per-line + a lambda HOF per
  * rule (interpreted, allocating a string array per row per rule); this
  * is ONE walk over the UTF-8 bytes with O(1) state — the shape a
  * per-document gate needs when every document of 100 TB funnels
  * through it. Character counts = non-continuation bytes (sound in
  * UTF-8); ASCII probes compare raw bytes, which never collide with
  * continuation bytes. The RULE arithmetic (ratios, bounds, the keep
  * conjunction) deliberately stays in ordinary Column expressions over
  * these integer fields, value-identical to the DuckDB oracle.
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStats.schema
  override def prettyName: String = "gopher_stats"

  override protected def nullSafeEval(input: Any): Any =
    GopherStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.GopherStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("word_chars", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("bullet_lines", LongType, nullable = false),
    StructField("ellipsis_lines", LongType, nullable = false),
    StructField("hash_chars", LongType, nullable = false),
    StructField("ellipsis_runs", LongType, nullable = false),
    StructField("stop_present", LongType, nullable = false)))

  /** Gopher's stop list, fixed by the rule ("must contain ≥2 of"). */
  val Stops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  private val stopBytes: Array[Array[Byte]] =
    Stops.map(_.getBytes("US-ASCII")).toArray

  @inline private def isSep(b: Byte): Boolean = b == ' ' || b == '\n'

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val len = bytes.length
    var nWords = 0L; var wordChars = 0L; var alphaWords = 0L
    var nLines = 1L; var bulletLines = 0L; var ellipsisLines = 0L
    var hashChars = 0L; var ellipsisRuns = 0L
    var stopMask = 0 // bit i = stopword i seen

    var lineStart = 0
    var i = 0
    while (i <= len) {
      val atEnd = i == len
      if (atEnd || bytes(i) == '\n') {
        // line [lineStart, i): bullet head + "..." tail
        var k = lineStart
        while (k < i && bytes(k) == ' ') k += 1
        if (k < i && (bytes(k) == '-' || bytes(k) == '*')) bulletLines += 1
        var e = i - 1
        while (e >= lineStart && bytes(e) == ' ') e -= 1
        if (e - 2 >= lineStart && bytes(e) == '.' &&
            bytes(e - 1) == '.' && bytes(e - 2) == '.') ellipsisLines += 1
        if (!atEnd) { nLines += 1; lineStart = i + 1 }
        i += 1
      } else if (isSep(bytes(i))) {
        i += 1
      } else {
        // word [ws, i): chars, alpha flag, stopword id, global symbols
        val ws = i
        var chars = 0L
        var hasAlpha = false
        var dotRun = 0
        while (i < len && !isSep(bytes(i))) { // isSep covers '\n'
          val b = bytes(i)
          if ((b & 0xC0) != 0x80) {
            chars += 1
            if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z'))
              hasAlpha = true
            else if (b == '#') hashChars += 1
            if (b == '.') dotRun += 1
            else { ellipsisRuns += dotRun / 3; dotRun = 0 }
          }
          i += 1
        }
        ellipsisRuns += dotRun / 3
        nWords += 1
        wordChars += chars
        if (hasAlpha) alphaWords += 1
        var s = 0
        while (s < stopBytes.length) {
          if ((stopMask & (1 << s)) == 0) {
            val sw = stopBytes(s)
            if (sw.length == i - ws) {
              var j = 0
              var ok = true
              while (ok && j < sw.length) {
                if (bytes(ws + j) != sw(j)) ok = false
                j += 1
              }
              if (ok) stopMask |= 1 << s
            }
          }
          s += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](nWords, wordChars, alphaWords,
      nLines, bulletLines, ellipsisLines, hashChars, ellipsisRuns,
      java.lang.Integer.bitCount(stopMask).toLong))
  }

  def gopher_stats(c: Column): Column =
    Bridge.column(GopherStats(Bridge.expression(c)))
}
