package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-n-gram linear scorer — the GPT-3/DCLM-style quality
  * classifier's scoring pass as ONE native expression: text →
  * `prior + Σ_n Σ_windows weights[bucket(gram)]`, where grams follow
  * [[Shingles]]'s convention exactly (split-on-single-space, L−n+1
  * space-joined windows per n) and `bucket` is the engine's standard
  * feature hash (q104's idiom): the first 15 lowercase-hex chars of
  * md5(gram) as a long, mod `buckets` — bit-reproducible in DuckDB as
  * `CAST(('0x' || substr(md5(g),1,15)) AS BIGINT) % M`.
  *
  * Plan-shape win over the composable encoding (explode(shingles) →
  * bucket → broadcast-join the weights → doc-keyed agg, q104's scoring
  * shape): no (doc, bucket) shuffle and no re-aggregation — the whole
  * score is computed scan-locally inside whole-stage codegen, so a
  * corpus quality gate is a single pass with zero exchanges. Summation
  * order is fixed (each n in ascending order, windows left-to-right),
  * making the per-row double bit-deterministic across runs and
  * partitionings.
  *
  * Reference analog: the predict-flow scoring surface
  * (utils/predict_flow/tasks.py:39-48) with the model reduced to a
  * weights file — see [[graft.functions.QualityClassifier]] for the
  * trainer and the [[graft.multimodal.LinearModel]] interop.
  */
final class NgramScoreKernel(val weights: Array[Double], val ns: Array[Int],
                             val prior: Double,
                             val charGrams: Boolean = false)
    extends Serializable {
  require(weights.nonEmpty, "empty weights")
  require(ns.nonEmpty && ns.forall(_ >= 1), s"bad ngram sizes ${ns.toSeq}")

  def score(text: UTF8String): Double =
    if (charGrams) scoreChars(text) else scoreWords(text)

  private def scoreWords(text: UTF8String): Double = {
    val words = text.split(NgramScoreKernel.Space, -1)
    var acc = prior
    var ni = 0
    while (ni < ns.length) {
      val n = ns(ni)
      val count = words.length - n + 1
      var i = 0
      while (i < count) {
        var s = words(i)
        var j = 1
        while (j < n) { s = UTF8String.concat(s, NgramScoreKernel.Space, words(i + j)); j += 1 }
        acc += weights(NgramScoreKernel.bucket(s, weights.length))
        i += 1
      }
      ni += 1
    }
    acc
  }

  /** Char-n-gram mode (the fastText LID featurization): windows over
    * CODE POINTS — `UTF8String.substring` and DuckDB `substr` agree on
    * code-point indexing, so grams and their md5 buckets match the
    * oracle's `substr(text, i, n)` exactly. */
  private def scoreChars(text: UTF8String): Double = {
    val m = text.numChars()
    var acc = prior
    var ni = 0
    while (ni < ns.length) {
      val n = ns(ni)
      val count = m - n + 1
      var i = 0
      while (i < count) {
        acc += weights(NgramScoreKernel.bucket(
          text.substring(i, i + n), weights.length))
        i += 1
      }
      ni += 1
    }
    acc
  }
}

object NgramScoreKernel {
  private val Space = UTF8String.fromString(" ")

  // MessageDigest is stateful and not thread-safe; one per task thread
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Feature-hash bucket: first 60 bits of md5(gram) mod `buckets` —
    * value-identical to
    * `pmod(hex_prefix_to_long(md5(gram), 15), buckets)` (15 hex chars
    * = the digest's first 8 bytes big-endian >>> 4, non-negative). */
  def bucket(gram: UTF8String, buckets: Int): Int = {
    val md = Md5.get()
    md.reset()
    val dig = md.digest(gram.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    ((v >>> 4) % buckets).toInt
  }
}

/** Weights are stored STRUCTURALLY (Seq) so expression equality and
  * canonicalization work (the [[NearestCentroid]] convention); the
  * executor-side kernel is a transient lazy rebuild (interpreted eval)
  * or a serialized codegen reference. */
case class HashedNgramScore(child: Expression, weights: Seq[Double],
                            ns: Seq[Int], prior: Double,
                            charGrams: Boolean = false)
    extends UnaryExpression {

  @transient private lazy val kernel: NgramScoreKernel =
    new NgramScoreKernel(weights.toArray, ns.toArray, prior, charGrams)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_ngram_score"

  override protected def nullSafeEval(input: Any): Any =
    kernel.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = ctx.addReferenceObj("ngramScoreKernel", kernel,
      classOf[NgramScoreKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kref.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramScore =
    copy(child = newChild)
}

object HashedNgramScore {
  def hashed_ngram_score(text: Column, weights: Seq[Double], ns: Seq[Int],
                         prior: Double, charGrams: Boolean = false): Column =
    Bridge.column(HashedNgramScore(Bridge.expression(text), weights, ns,
      prior, charGrams))
}
