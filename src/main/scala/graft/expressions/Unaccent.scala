package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent-stripping transliteration as a native Catalyst expression
  * (SURVEY §2.10 U1 — the reference runs python `unidecode` over event
  * descriptions, rj_cor/comando/eventos/tasks.py:209; column-name slugs use
  * the same NFKD trick, utils/utils.py:542-565).
  *
  * NFD-decomposes and drops combining marks — "Cüstómér" → "Customer".
  * Implemented with `doGenCode` calling a static helper so it stays inside
  * whole-stage codegen instead of falling back to interpreted eval.
  */
case class Unaccent(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "unaccent"

  override def nullSafeEval(input: Any): Any =
    Unaccent.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Unaccent.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): Unaccent =
    copy(child = newChild)
}

object Unaccent {
  private val marks = "\\p{M}+".r

  /** Static entry point shared by interpreted eval and generated code. */
  def strip(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    // Fast path: pure ASCII needs no normalization.
    var i = 0
    var ascii = true
    while (ascii && i < str.length) { if (str.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) s
    else UTF8String.fromString(
      marks.replaceAllIn(Normalizer.normalize(str, Normalizer.Form.NFD), ""))
  }

  def unaccent(c: Column): Column =
    Bridge.column(Unaccent(Bridge.expression(c)))
}
