package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher REPETITION filter counters (Rae et al. 2021 §A1.1's
  * other half — [[GopherStats]] carries the quality rules) as ONE
  * kernel pass per row: thirteen fractions the published thresholds
  * gate on. Semantics, pinned here and mirrored verbatim by the q145
  * oracle:
  *
  *  - WORDS are the nonempty `[ \n]`-separated runs (the GopherStats
  *    word definition); `total word chars` = Σ len(word).
  *  - LINES split on '\n', PARAGRAPHS on "\n\n" (kept as-is, no trim).
  *    `dup_*_frac` = occurrences beyond the first / all occurrences;
  *    `dup_*_char_frac` weights each occurrence by its char length —
  *    both reduce to (total − distinct) because every occurrence of a
  *    unit beyond its first is a duplicate.
  *  - TOP n-gram (n = 2..4): the most frequent word n-gram, ties to
  *    the lexicographically SMALLEST (determinism across engines);
  *    char fraction = freq × (chars of its words) / total word chars.
  *  - DUP n-gram (n = 5..10): char fraction of word positions COVERED
  *    by any n-gram occurring ≥ 2 times — ALL occurrences count and
  *    overlapping covers count each position once (the coverage-mask
  *    subtlety every faithful implementation carries).
  *
  * A Column/HOF encoding of the coverage masks would re-evaluate the
  * token split per lambda element (the measured O(tokens²) trap — see
  * TextOps.decontamScrub's history); here the split happens once and
  * nine hash passes reuse it. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.Schema
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RepetitionStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val Schema: StructType = StructType(Seq(
    "dup_line_frac", "dup_line_char_frac",
    "dup_para_frac", "dup_para_char_frac",
    "top2_char_frac", "top3_char_frac", "top4_char_frac",
    "dup5_char_frac", "dup6_char_frac", "dup7_char_frac",
    "dup8_char_frac", "dup9_char_frac", "dup10_char_frac")
    .map(StructField(_, DoubleType, nullable = false)))

  /** (beyond-first occurrence fraction, beyond-first char fraction). */
  private def dupUnitFracs(units: Array[String]): (Double, Double) = {
    if (units.length == 0) return (0.0, 0.0)
    val seen = new java.util.HashSet[String](units.length * 2)
    var dupN = 0
    var dupChars = 0L
    var totalChars = 0L
    var i = 0
    while (i < units.length) {
      val u = units(i)
      totalChars += u.length
      if (!seen.add(u)) { dupN += 1; dupChars += u.length }
      i += 1
    }
    (dupN.toDouble / units.length,
      if (totalChars == 0) 0.0 else dupChars.toDouble / totalChars)
  }

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val (lf, lcf) = dupUnitFracs(s.split("\n", -1))
    val (pf, pcf) = dupUnitFracs(s.split("\n\n", -1))

    // words: nonempty [ \n] runs, with per-word char lengths
    val rawWords = s.split("[ \n]+", -1)
    var nW = 0
    var i = 0
    while (i < rawWords.length) {
      if (rawWords(i).nonEmpty) nW += 1
      i += 1
    }
    val words = new Array[String](nW)
    var totalWordChars = 0L
    var k = 0
    i = 0
    while (i < rawWords.length) {
      if (rawWords(i).nonEmpty) {
        words(k) = rawWords(i); totalWordChars += rawWords(i).length; k += 1
      }
      i += 1
    }
    val out = new Array[Double](13)
    out(0) = lf; out(1) = lcf; out(2) = pf; out(3) = pcf
    if (totalWordChars > 0) {
      // ONE reusable gram→count map per n; grams keyed by their joined
      // string (single-space join — words contain no spaces)
      val sb = new java.lang.StringBuilder(64)
      def gramAt(j: Int, n: Int): String = {
        sb.setLength(0)
        var t = 0
        while (t < n) {
          if (t > 0) sb.append(' ')
          sb.append(words(j + t))
          t += 1
        }
        sb.toString
      }
      // top n-gram char fraction, n = 2..4
      var n = 2
      while (n <= 4) {
        if (nW >= n) {
          val freq = new java.util.HashMap[String, Integer]()
          var j = 0
          while (j <= nW - n) {
            freq.merge(gramAt(j, n), Integer.valueOf(1),
              (a: Integer, b: Integer) => Integer.valueOf(a.intValue() + b.intValue()))
            j += 1
          }
          var bestGram: String = null
          var bestFreq = 0
          freq.forEach { (g, c) =>
            if (c > bestFreq || (c == bestFreq && g.compareTo(bestGram) < 0)) {
              bestGram = g; bestFreq = c
            }
          }
          // chars of the gram's words = joined length minus separators
          val gramChars = bestGram.length - (n - 1)
          out(2 + n) = bestFreq.toDouble * gramChars / totalWordChars
        }
        n += 1
      }
      // duplicated n-gram COVERAGE char fraction, n = 5..10
      val covered = new Array[Boolean](nW)
      n = 5
      while (n <= 10) {
        if (nW >= n) {
          val freq = new java.util.HashMap[String, Integer]()
          var j = 0
          while (j <= nW - n) {
            freq.merge(gramAt(j, n), Integer.valueOf(1),
              (a: Integer, b: Integer) => Integer.valueOf(a.intValue() + b.intValue()))
            j += 1
          }
          java.util.Arrays.fill(covered, false)
          j = 0
          while (j <= nW - n) {
            if (freq.get(gramAt(j, n)).intValue() >= 2) {
              var t = j
              while (t < j + n) { covered(t) = true; t += 1 }
            }
            j += 1
          }
          var chars = 0L
          var w = 0
          while (w < nW) {
            if (covered(w)) chars += words(w).length
            w += 1
          }
          out(2 + n) = chars.toDouble / totalWordChars // dup5 at index 7
        }
        n += 1
      }
    }
    InternalRow(out(0), out(1), out(2), out(3), out(4), out(5), out(6),
      out(7), out(8), out(9), out(10), out(11), out(12))
  }

  def repetition_stats(c: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(c)))
}
