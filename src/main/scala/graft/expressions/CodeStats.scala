package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass counters for the CODE-corpus preprocessing filters of The
  * Stack (Kocetkov et al. 2022 §2.2) / SantaCoder (Allal et al. 2023
  * §4.2) / StarCoder (Li et al. 2023) — the published rule set every
  * code-pretraining pipeline applies before anything model-based:
  * files are REMOVED when average line length > 100, maximum line
  * length > 1000, alphanumeric character fraction < 0.25, or an XML
  * declaration ("<?xml version=") sits in the first 100 characters.
  * This kernel emits the integer counters; the rule arithmetic stays
  * in plain Columns ([[graft.functions.TextOps.stackCodeKeep]]),
  * value-identical to the DuckDB oracle — the [[GopherStats]] split.
  *
  * text → struct of longs
  *
  *  - n_chars        total characters (code points = non-continuation
  *                   UTF-8 bytes, the [[GopherStats]] convention);
  *  - n_lines        newline count + 1 (split semantics);
  *  - line_chars     Σ per-line characters — n_chars minus the
  *                   newlines, so avg line length = line_chars/n_lines;
  *  - max_line_chars longest line, in characters;
  *  - alnum_chars    ASCII [a-zA-Z0-9] characters (the fraction's
  *                   numerator; denominator is n_chars);
  *  - xml_head       1 when the literal "<?xml version=" STARTS at
  *                   character position ≤ 100 (1-based), else 0.
  *
  * Why a kernel and not HOFs: the composable encoding splits the text
  * into a line array per row and walks it per rule (interpreted
  * lambdas, one allocation per line); this is ONE walk over the UTF-8
  * bytes with O(1) state — a per-file gate's shape when every file of
  * a multi-TB code corpus funnels through it. ASCII probes compare
  * raw bytes, which never collide with continuation bytes.
  */
case class CodeStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CodeStats.schema
  override def prettyName: String = "code_stats"

  override protected def nullSafeEval(input: Any): Any =
    CodeStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CodeStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CodeStats =
    copy(child = newChild)
}

object CodeStats {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("max_line_chars", LongType, nullable = false),
    StructField("alnum_chars", LongType, nullable = false),
    StructField("xml_head", LongType, nullable = false)))

  private val XmlDecl: Array[Byte] = "<?xml version=".getBytes("US-ASCII")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val len = bytes.length
    var nChars = 0L; var nLines = 1L
    var curLine = 0L; var maxLine = 0L
    var alnum = 0L; var xmlHead = 0L

    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (b == '\n') {
        if (curLine > maxLine) maxLine = curLine
        curLine = 0L
        nLines += 1
        nChars += 1
      } else if ((b & 0xC0) != 0x80) { // non-continuation = one code point
        // the declaration is pure ASCII, so a byte-compare at a
        // non-continuation byte can only match at a character start
        if (b == '<' && xmlHead == 0L && nChars < 100L &&
            len - i >= XmlDecl.length) {
          var j = 1
          var ok = true
          while (ok && j < XmlDecl.length) {
            if (bytes(i + j) != XmlDecl(j)) ok = false
            j += 1
          }
          if (ok) xmlHead = 1L
        }
        if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
            (b >= '0' && b <= '9')) alnum += 1
        nChars += 1
        curLine += 1
      }
      i += 1
    }
    if (curLine > maxLine) maxLine = curLine
    new GenericInternalRow(Array[Any](nChars, nLines,
      nChars - (nLines - 1), maxLine, alnum, xmlHead))
  }

  def code_stats(c: Column): Column =
    Bridge.column(CodeStats(Bridge.expression(c)))
}
