package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → main-content text extraction as ONE native pass — the first
  * stage of a crawl-derived training corpus (the RefinedWeb/trafilatura
  * shape, simplified to a deterministic single-scan state machine):
  *
  *  - `<script>`/`<style>` subtrees, comments and CDATA are skipped;
  *  - block-level tags (`p div br li tr h1..h6 table ul ol section
  *    article header footer blockquote pre`) break LINES; other tags
  *    drop, their text flows through;
  *  - entities decode (`&amp; &lt; &gt; &quot; &#39; &nbsp;`, numeric
  *    decimal/hex) in text context;
  *  - whitespace collapses per line;
  *  - per-line BOILERPLATE filter: a line survives when it carries at
  *    least `minWords` words AND its anchor-text share (characters
  *    inside `<a>…</a>`) stays ≤ `maxLinkDensity` — nav bars, footers
  *    and link farms are short and almost-all-anchor, the classic
  *    link-density heuristic (Kohlschütter et al. 2010's strongest
  *    single feature).
  *
  * Malformed input degrades, never throws: an unterminated tag or
  * entity at EOF is dropped/passed as text, unknown entities pass
  * through verbatim, stray `>` is text. Raw extraction = (0, 1.0).
  *
  * Scale shape: scan-local scalar work inside whole-stage codegen —
  * the crawl-to-text stage adds zero exchanges, the q130 scorer's
  * plan argument. Reference analog: the scrape surface
  * (utils/tasks.py HTML handling) extracts tables; THIS is the
  * free-text sibling a pretraining pipeline needs. */
case class HtmlText(child: Expression, minWords: Int, maxLinkDensity: Double)
    extends UnaryExpression {
  require(minWords >= 0, s"minWords must be >= 0, got $minWords")
  require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
    s"maxLinkDensity must be in [0, 1], got $maxLinkDensity")

  override def dataType: DataType = StringType
  override def prettyName: String = "html_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlText.compute(input.asInstanceOf[UTF8String], minWords, maxLinkDensity)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HtmlText.compute($c, $minWords, $maxLinkDensity);")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {
  private val BlockTags = Set("p", "div", "br", "li", "tr", "h1", "h2",
    "h3", "h4", "h5", "h6", "table", "ul", "ol", "section", "article",
    "header", "footer", "blockquote", "pre")

  def compute(html: UTF8String, minWords: Int,
              maxLinkDensity: Double): UTF8String = {
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder
    val line = new java.lang.StringBuilder
    var lineAnchor = 0
    var lineTotal = 0
    var anchorDepth = 0
    var i = 0

    def flushLine(): Unit = {
      // collapse whitespace, count words
      var words = 0
      var inWs = true
      val cleaned = new java.lang.StringBuilder
      var j = 0
      while (j < line.length) {
        val c = line.charAt(j)
        if (Character.isWhitespace(c)) {
          if (!inWs) cleaned.append(' ')
          inWs = true
        } else {
          if (inWs) words += 1
          cleaned.append(c)
          inWs = false
        }
        j += 1
      }
      while (cleaned.length > 0 &&
        cleaned.charAt(cleaned.length - 1) == ' ')
        cleaned.setLength(cleaned.length - 1)
      val dens =
        if (lineTotal == 0) 0.0 else lineAnchor.toDouble / lineTotal
      if (cleaned.length > 0 && words >= minWords &&
          dens <= maxLinkDensity) {
        if (out.length > 0) out.append('\n')
        out.append(cleaned)
      }
      line.setLength(0); lineAnchor = 0; lineTotal = 0
    }

    def skipTo(marker: String): Unit = {
      val idx = s.indexOf(marker, i)
      i = if (idx < 0) n else idx + marker.length
    }

    // CASE-INSENSITIVE close-tag skip for raw-text elements: legacy
    // crawl HTML closes <SCRIPT> with </SCRIPT>, and a case-sensitive
    // search would silently drop the rest of the document
    def skipToCloseTag(tag: String): Unit = {
      val probe = "</" + tag
      var k = i
      while (k >= 0) {
        k = s.indexOf('<', k)
        if (k < 0) { i = n; return }
        if (s.regionMatches(true, k, probe, 0, probe.length)) {
          val gt = s.indexOf('>', k + probe.length)
          i = if (gt < 0) n else gt + 1
          return
        }
        k += 1
      }
      i = n
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) { i += 4; skipTo("-->") }
        else if (s.regionMatches(true, i, "<![CDATA[", 0, 9)) {
          i += 9; skipTo("]]>")
        } else {
          // parse the tag name
          var j = i + 1
          var closing = false
          if (j < n && s.charAt(j) == '/') { closing = true; j += 1 }
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(s.charAt(j))) j += 1
          // Locale.ROOT: a Turkish-locale executor lowercases <SCRIPT>
          // to "scrıpt" (dotless ı), misses the script-skip match, and
          // leaks raw JavaScript into corpus text (review-found)
          val name = s.substring(nameStart, j)
            .toLowerCase(java.util.Locale.ROOT)
          // tag end respects QUOTED attribute values: a '>' inside
          // alt="cats > dogs" must not cut the tag and leak the
          // attribute tail into the corpus text
          var end = -1
          var k = j
          var quote: Char = 0
          while (k < n && end < 0) {
            val ch = s.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') end = k
            k += 1
          }
          if (name.isEmpty && !closing) {
            // HTML5: '<' not starting a tag name is literal text
            line.append('<'); lineTotal += 1
            if (anchorDepth > 0) lineAnchor += 1
            i += 1
          }
          else if (end < 0) i = n // unterminated tag: drop rest
          else {
            i = end + 1
            name match {
              case "script" if !closing => skipToCloseTag("script")
              case "style" if !closing => skipToCloseTag("style")
              case "a" =>
                if (closing) { if (anchorDepth > 0) anchorDepth -= 1 }
                else if (s.charAt(end - 1) != '/') anchorDepth += 1
              case t if BlockTags.contains(t) => flushLine()
              case _ =>
            }
          }
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val (decoded, next) =
          if (semi > i && semi - i <= 10) {
            val ent = s.substring(i + 1, semi)
            val d = ent match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case "nbsp" => " "
              case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
                try String.valueOf(
                  Character.toChars(Integer.parseInt(ent.substring(2), 16)))
                catch { case _: Exception => null }
              case _ if ent.startsWith("#") =>
                try String.valueOf(
                  Character.toChars(Integer.parseInt(ent.substring(1))))
                catch { case _: Exception => null }
              case _ => null
            }
            if (d != null) (d, semi + 1) else (s.substring(i, i + 1), i + 1)
          } else (s.substring(i, i + 1), i + 1)
        line.append(decoded)
        var k = 0
        while (k < decoded.length) {
          if (!Character.isWhitespace(decoded.charAt(k))) {
            lineTotal += 1
            if (anchorDepth > 0) lineAnchor += 1
          }
          k += 1
        }
        i = next
      } else {
        line.append(c)
        if (!Character.isWhitespace(c)) {
          lineTotal += 1
          if (anchorDepth > 0) lineAnchor += 1
        }
        i += 1
      }
    }
    flushLine()
    UTF8String.fromString(out.toString)
  }

  def html_text(html: Column, minWords: Int = 0,
                maxLinkDensity: Double = 1.0): Column =
    Bridge.column(HtmlText(Bridge.expression(html), minWords, maxLinkDensity))
}
