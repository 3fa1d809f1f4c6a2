package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Bpe, WordPieceVocab}

/** WordPiece tokenization as a native expression — [[BpeEncode]] /
  * [[UnigramEncode]]'s architecture verbatim (tokenization is the
  * densest per-row kernel and must stay inside whole-stage codegen;
  * the vocabulary threads through the codegen reference array and
  * carries the per-task Zipf-absorbing word cache). Pretokenization is
  * [[Bpe.PretokenPattern]] — the SAME denominator as the other two
  * families, which is what makes fertility comparisons across the
  * three (q129/q141) meaningful. */
case class WordPieceEncode(child: Expression, vocab: WordPieceVocab,
                           countOnly: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    if (countOnly) LongType else ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (countOnly) "wordpiece_count" else "wordpiece_tokens"

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    if (countOnly) WordPieceEncode.computeCount(t, vocab)
    else WordPieceEncode.computeTokens(t, vocab)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef =
      ctx.addReferenceObj("wpVocab", vocab, classOf[WordPieceVocab].getName)
    val kernel = if (countOnly) "computeCount" else "computeTokens"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WordPieceEncode.$kernel($c, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPieceEncode {

  /** Static kernel shared by interpreted eval and generated code. */
  def computeTokens(text: UTF8String, vocab: WordPieceVocab): ArrayData = {
    val pieces = Bpe.pretokenize(text.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < pieces.length) {
      val toks = vocab.encodeCached(pieces(i))
      var j = 0
      while (j < toks.length) {
        out += UTF8String.fromString(toks(j)); j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def computeCount(text: UTF8String, vocab: WordPieceVocab): Long = {
    val pieces = Bpe.pretokenize(text.toString)
    var n = 0L
    var i = 0
    while (i < pieces.length) {
      n += vocab.encodeCached(pieces(i)).length; i += 1
    }
    n
  }

  def tokens(c: Column, vocab: WordPieceVocab): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(c), vocab, countOnly = false))

  def count(c: Column, vocab: WordPieceVocab): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(c), vocab, countOnly = true))
}
