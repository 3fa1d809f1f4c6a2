package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** 64-bit perceptual audio fingerprint — [[DHash64]]'s idea applied
  * to a SPECTROGRAM (the Haitsma–Kalker family's energy-difference
  * bits, condensed to one 64-bit row hash): the clip splits into 9
  * equal time windows, each window's energy is measured in 8
  * frequency bands (Goertzel recurrences at bins 1–8 of the window —
  * O(n·B), no FFT table), and bit (band, t) records whether the
  * band's energy RISES between consecutive windows. Comparisons are
  * per-band over time, so the hash is invariant to global gain
  * (scaling multiplies every energy) and tolerant of additive noise
  * well below the signal's band structure; it is deliberately NOT
  * alignment-invariant (windows are positions in the clip — the
  * near-dup target is re-encodes/re-levels of the same clip, not
  * arbitrary sub-clips; clip-level containment composes at the
  * video layer's overlap join instead).
  *
  * Bands are DFT bins of the window (frequencies relative to window
  * length), so the same audio resampled to another rate — which
  * scales time and frequency together — lands in the same cells.
  * One fused codegen expression over `array<double>` / `array<float>`
  * samples ([[graft.multimodal.Multimodal.decodeAudio]]'s column);
  * NULL samples null-propagate. Pairing rides the same 64-bit
  * Hamming-LSH machinery as text SimHash and image dHash.
  */
object AudioHash64 {
  val TimeWindows = 9
  val Bands = 8

  /** The 9×8 (window × band) energy grid — |DFT bin (b+1)|² of each
    * window via the Goertzel recurrence. Exposed so the parity spec
    * can check the recurrence against a direct DFT sum. */
  private[graft] def bandEnergies(s: Array[Double]): Array[Array[Double]] = {
    val n = s.length
    val e = Array.ofDim[Double](TimeWindows, Bands)
    var t = 0
    while (t < TimeWindows) {
      val from = (t.toLong * n / TimeWindows).toInt
      val to = ((t + 1).toLong * n / TimeWindows).toInt
      val w = to - from
      if (w > 0) {
        var b = 0
        while (b < Bands) {
          // Goertzel at bin (b+1) of this window
          val omega = 2.0 * math.Pi * (b + 1).toDouble / w
          val coeff = 2.0 * math.cos(omega)
          var s1 = 0.0
          var s2 = 0.0
          var i = from
          while (i < to) {
            val s0 = s(i) + coeff * s1 - s2
            s2 = s1; s1 = s0
            i += 1
          }
          e(t)(b) = s1 * s1 + s2 * s2 - coeff * s1 * s2
          b += 1
        }
      }
      t += 1
    }
    e
  }

  def compute(s: Array[Double]): Long = {
    val e = bandEnergies(s)
    var hash = 0L
    var b = 0
    while (b < Bands) {
      var t = 0
      while (t < TimeWindows - 1) {
        hash = (hash << 1) | (if (e(t)(b) < e(t + 1)(b)) 1L else 0L)
        t += 1
      }
      b += 1
    }
    hash
  }

  def audio_hash64(samples: Column): Column =
    Bridge.column(AudioHash64Expr(Bridge.expression(samples)))
}

case class AudioHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "audio_hash64"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    AudioHash64.compute(
      if (elemIsFloat) a.toFloatArray().map(_.toDouble)
      else a.toDoubleArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemIsFloat)
        s"""double[] ${ev.value}_d = new double[$c.numElements()];
           |for (int i = 0; i < ${ev.value}_d.length; i++)
           |  ${ev.value}_d[i] = (double) $c.getFloat(i);
           |${ev.value} = graft.expressions.AudioHash64.compute(${ev.value}_d);
           |""".stripMargin
      else
        s"${ev.value} = graft.expressions.AudioHash64.compute($c.toDoubleArray());")

  override protected def withNewChildInternal(newChild: Expression): AudioHash64Expr =
    copy(child = newChild)
}
