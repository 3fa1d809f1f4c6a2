package graft

import org.scalatest.funsuite.AnyFunSuite

/** Type-width lint over every oracle in `SparkEntry.oracleSql`.
  *
  * The r11 red row (q125) was not a wrong answer: DuckDB widens
  * `SUM(BIGINT)` to HUGEINT (decimal128), so an oracle whose FINAL
  * select returns such a sum *bare* hash-mismatches Spark's int64 even
  * when every value is identical. This spec makes that class
  * unrepresentable: no final-select output column may be (a) a bare
  * reference to an alias defined as an uncast integer `SUM(...)`, or
  * (b) a direct uncast integer `SUM(...)` itself. Anything routed
  * through CAST, division (DuckDB `/` on integers yields DOUBLE), or a
  * double-producing function (sqrt/ln/exp/pow) is out of the hazard
  * class by construction.
  *
  * Pure string contract — no DuckDB in the sandbox, so this is a sound
  * approximation tuned on the full oracle corpus: it flags the exact
  * pre-fix q125 text and is green on everything shipped.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  // ---- tiny SQL tokenizer helpers (comments first: apostrophes in
  // comments would otherwise unbalance the string-stripper) ----

  private def stripStrings(sql0: String): String = {
    val noComments = sql0.replaceAll("--[^\n]*", "")
    noComments.replaceAll("'[^']*'", "''")
  }

  /** Index of the ')' matching the '(' at `open`. -1 if unbalanced. */
  private def findMatching(s: String, open: Int): Int = {
    var d = 0; var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** All `SELECT <list> FROM` spans: (selectKeywordStart, listStart, listEnd). */
  private def selectSpans(sql: String): Seq[(Int, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val re = "(?i)\\bSELECT\\b".r
    for (m <- re.findAllMatchIn(sql)) {
      val s = m.end
      var d = 0; var i = s; var done = false
      while (i < sql.length && !done) {
        sql.charAt(i) match {
          case '(' => d += 1
          case ')' if d == 0 => out += ((m.start, s, i)); done = true
          case ')' => d -= 1
          case c if d == 0 && (c == 'F' || c == 'f') &&
              i + 4 <= sql.length &&
              sql.substring(i, i + 4).equalsIgnoreCase("FROM") &&
              !Character.isLetterOrDigit(sql.charAt(i - 1)) &&
              (i + 4 == sql.length || !Character.isLetterOrDigit(sql.charAt(i + 4))) =>
            out += ((m.start, s, i)); done = true
          case _ =>
        }
        i += 1
      }
      if (!done) out += ((m.start, s, sql.length))
    }
    out.toSeq
  }

  /** Split a select list on top-level commas. */
  private def splitTop(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var d = 0; val cur = new StringBuilder
    for (c <- s) c match {
      case '(' => d += 1; cur += c
      case ')' => d -= 1; cur += c
      case ',' if d == 0 => parts += cur.toString; cur.clear()
      case _ => cur += c
    }
    if (cur.toString.trim.nonEmpty) parts += cur.toString
    parts.toSeq
  }

  private val doubleMarker =
    "(?i)(AS\\s+DOUBLE|::DOUBLE|\\bsqrt\\s*\\(|\\bln\\s*\\(|\\bexp\\s*\\(|\\blog\\b|\\bpow\\s*\\()".r
  private val bareIdent = "(?i)^(\\w+\\.)?(\\w+)$".r
  private val arithIdents = "^[\\w.\\s*+-]+$".r
  private val asAlias = "(?is)^(.*?)\\s+AS\\s+(\\w+)\\s*$".r
  private val sumOpen = "(?i)^SUM\\s*\\(".r

  /** Does `expr` produce a DOUBLE in DuckDB (directly or through the
    * alias environment)? `/` on integers yields DOUBLE in DuckDB. */
  private def isDoubleish(expr: String, defs: Map[String, String], depth: Int = 0): Boolean = {
    if (doubleMarker.findFirstIn(expr).isDefined) return true
    if ("[^/]/[^/]".r.findFirstIn(expr).isDefined) return true
    val t = expr.trim
    t match {
      case bareIdent(_, name) if depth < 4 =>
        defs.get(name.toLowerCase) match {
          case Some(d) => return isDoubleish(d, defs, depth + 1)
          case None =>
        }
      case _ =>
    }
    // arithmetic over identifiers: double if ANY operand resolves double
    if (depth < 4 && arithIdents.findFirstIn(t).isDefined) {
      val ids = "\\b[a-zA-Z_]\\w*\\b".r.findAllIn(t).toSeq
      if (ids.exists(id => defs.get(id.toLowerCase)
            .exists(d => isDoubleish(d, defs, depth + 1)))) return true
    }
    false
  }

  /** (alias -> defining expr, hazard aliases = uncast integer SUMs). */
  private def defsAndHazards(sql: String): (Map[String, String], Set[String]) = {
    val defs = scala.collection.mutable.Map.empty[String, String]
    for ((_, s, f) <- selectSpans(sql); expr <- splitTop(sql.substring(s, f)))
      expr.trim match {
        case asAlias(core, name) => defs(name.toLowerCase) = core.trim
        case _ =>
      }
    val d = defs.toMap
    val hz = d.collect { case (name, core) if {
      sumOpen.findFirstMatchIn(core) match {
        case Some(m) =>
          val j = findMatching(core, m.end - 1)
          j == core.length - 1 && !isDoubleish(core.substring(m.end, j), d)
        case None => false
      }
    } => name }.toSet
    (d, hz)
  }

  private def lint(name: String, rawSql: String): Seq[String] = {
    val sql = stripStrings(rawSql)
    val (defs, hz) = defsAndHazards(sql)
    val spans = selectSpans(sql)
    // final select = last span whose SELECT keyword sits at paren depth 0
    val fin = spans.filter { case (st, _, _) =>
      val pre = sql.substring(0, st)
      pre.count(_ == '(') == pre.count(_ == ')')
    }.lastOption
    fin match {
      case None => Seq(s"$name: no top-level final SELECT found")
      case Some((_, s, f)) =>
        splitTop(sql.substring(s, f)).flatMap { expr =>
          val core = expr.trim match {
            case asAlias(c, _) => c.trim
            case e => e
          }
          core match {
            case bareIdent(_, id) if hz.contains(id.toLowerCase) =>
              Some(s"$name: final select returns integer-SUM alias `$id` bare — " +
                "DuckDB widens to HUGEINT vs Spark int64; wrap in CAST(... AS BIGINT)")
            case _ =>
              sumOpen.findFirstMatchIn(core) match {
                case Some(m) =>
                  val j = findMatching(core, m.end - 1)
                  if (j == core.length - 1 && !isDoubleish(core.substring(m.end, j), defs))
                    Some(s"$name: final select has a direct uncast integer SUM — " +
                      s"wrap in CAST(... AS BIGINT): ${core.take(60)}")
                  else None
                case None => None
              }
          }
        }
    }
  }

  test("no oracle's final select returns an uncast integer SUM (HUGEINT hazard)") {
    val errs = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .flatMap { case (n, s) => lint(n, s) }
    assert(errs.isEmpty, "\n" + errs.mkString("\n"))
  }

  test("the lint actually detects the r11 q125 failure shape") {
    val preFix =
      """WITH m AS (
        |  SELECT source, SUM(CAST(len(s) AS BIGINT)) AS n_tok
        |  FROM documents GROUP BY 1)
        |SELECT source, n_tok FROM m ORDER BY source""".stripMargin
    assert(lint("q125_prefix", preFix).nonEmpty)
    val postFix = preFix.replace("SELECT source, n_tok FROM",
      "SELECT source, CAST(n_tok AS BIGINT) AS n_tok FROM")
    assert(lint("q125_postfix", postFix).isEmpty)
    // direct uncast SUM in the final select is also caught
    val direct = "SELECT source, SUM(n) FROM t GROUP BY 1"
    assert(lint("direct", direct).nonEmpty)
    // double-producing sums are NOT hazards
    val dbl = "SELECT source, SUM(sqrt(n)) AS s FROM t GROUP BY 1"
    assert(lint("dbl", dbl).isEmpty)
  }
}
