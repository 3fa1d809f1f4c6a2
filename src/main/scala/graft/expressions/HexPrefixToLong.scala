package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First `len` lowercase-hex chars of a string as a LONG (len ≤ 15 keeps
  * it in the positive signed range).
  *
  * Exists because `conv(substr(x,1,15),16,10)` routes through generic
  * radix conversion (string → byte array → string → cast), measured
  * ~1.8× slower across a MinHash signature scan. This is a 15-iteration
  * shift-or loop over the UTF8String bytes, inlined into whole-stage
  * codegen. Input must be lowercase hex (md5's output); digit validity is
  * not checked on the hot path, but length IS bounded by the actual
  * string (shorter inputs parse what is there). */
case class HexPrefixToLong(child: Expression, len: Int) extends UnaryExpression {
  require(len >= 1 && len <= 15, s"len $len out of [1,15]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hex_prefix_to_long"

  override protected def nullSafeEval(input: Any): Any =
    HexPrefixToLong.parse(input.asInstanceOf[UTF8String], len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      // bound by numBytes: UTF8String.getByte has no range check, and the
      // function is SQL-registered — a short input must not read adjacent
      // off-heap memory
      s"""
         |long $v = 0L;
         |int $n = java.lang.Math.min($len, $c.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  int $b = $c.getByte($i);
         |  $v = ($v << 4) | ($b <= '9' ? $b - '0' : $b - 'a' + 10);
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexPrefixToLong =
    copy(child = newChild)
}

object HexPrefixToLong {
  def parse(s: UTF8String, len: Int): Long = {
    var v = 0L
    var i = 0
    val n = math.min(len, s.numBytes())
    while (i < n) {
      val b = s.getByte(i)
      v = (v << 4) | (if (b <= '9') b - '0' else b - 'a' + 10)
      i += 1
    }
    v
  }

  def hex_prefix_to_long(c: Column, len: Int): Column =
    Bridge.column(HexPrefixToLong(Bridge.expression(c), len))
}
