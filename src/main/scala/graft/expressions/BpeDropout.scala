package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Bpe, BpeVocab}

/** BPE-dropout as a native expression — [[UnigramSample]]'s shape for
  * the BPE family ([[BpeVocab.encodeWordDropout]] per pretoken):
  * binary (text, seed), per-piece seeds decorrelate repeats within a
  * document, no word cache (the sample depends on the seed by
  * design). */
case class BpeDropout(left: Expression, right: Expression,
                      vocab: BpeVocab, p: Double, countOnly: Boolean)
    extends BinaryExpression {
  require(p >= 0.0 && p <= 1.0, s"dropout must be in [0,1]: $p")

  override def dataType: DataType =
    if (countOnly) LongType else ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (countOnly) "bpe_dropout_count" else "bpe_dropout"

  override protected def nullSafeEval(text: Any, seed: Any): Any = {
    val t = text.asInstanceOf[UTF8String]
    val s = seed.asInstanceOf[Long]
    if (countOnly) BpeDropout.computeCount(t, s, vocab, p)
    else BpeDropout.computeTokens(t, s, vocab, p)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef =
      ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    val kernel = if (countOnly) "computeCount" else "computeTokens"
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.expressions.BpeDropout.$kernel($t, $s, $vocabRef, $p);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeDropout =
    copy(left = newLeft, right = newRight)
}

object BpeDropout {

  import graft.core.Mix.mix

  def computeTokens(text: UTF8String, seed: Long, vocab: BpeVocab,
                    p: Double): ArrayData = {
    val pieces = Bpe.pretokenize(text.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < pieces.length) {
      val toks = vocab.encodeWordDropout(pieces(i), p, mix(seed ^ i.toLong))
      var j = 0
      while (j < toks.length) {
        out += UTF8String.fromString(toks(j)); j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def computeCount(text: UTF8String, seed: Long, vocab: BpeVocab,
                   p: Double): Long = {
    val pieces = Bpe.pretokenize(text.toString)
    var n = 0L
    var i = 0
    while (i < pieces.length) {
      n += vocab.encodeWordDropout(pieces(i), p, mix(seed ^ i.toLong)).length
      i += 1
    }
    n
  }

  def tokens(text: Column, seed: Column, vocab: BpeVocab, p: Double): Column =
    Bridge.column(BpeDropout(Bridge.expression(text),
      Bridge.expression(seed), vocab, p, countOnly = false))

  def count(text: Column, seed: Column, vocab: BpeVocab, p: Double): Column =
    Bridge.column(BpeDropout(Bridge.expression(text),
      Bridge.expression(seed), vocab, p, countOnly = true))
}
