package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise a − b over two numeric arrays as a native, codegen'd
  * expression — the residual computation of the IVFADC training path
  * ([[graft.functions.VectorOps.pqTrainCodebooksResidual]]).
  *
  * Replaces `zip_with(a, b, (x, y) => coalesce(x,0) - coalesce(y,0))`,
  * whose higher-order function is CodegenFallback (one interpreted
  * closure call and two boxed doubles per element) — the last HOF that
  * was left on a vector data path after rounds 9–10 swept the class.
  * Semantics mirror that zip_with shape exactly: output length is
  * max(len(a), len(b)) and the shorter side pads with 0.0 (parity
  * spec-pinned). Elements must be non-null (embedding columns —
  * enforced upstream, same contract as [[VecDot]]).
  */
case class VecSub(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sub"

  // The float/double fast reads below index the array's PACKED layout
  // directly — any other element type would be silently misread, so
  // reject it at analysis (the call-site cast this kernel replaced
  // used to widen; now the analyzer refuses instead of corrupting)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    Seq(left, right).map(_.dataType).find {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => false
      case _ => true
    } match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"vec_sub needs array<float> or array<double> inputs, got $bad")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val na = xs.numElements(); val nb = ys.numElements()
    val n = math.max(na, nb)
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (i >= na) 0.0 else if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (i >= nb) 0.0 else if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      out(i) = x - y
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = java.lang.Math.max($na, $nb);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ($i >= $na) ? 0.0 : ($lGet);
         |  double $y = ($i >= $nb) ? 0.0 : ($rGet);
         |  $out[$i] = $x - $y;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecSub = copy(left = newLeft, right = newRight)
}

object VecSub {
  def vec_sub(a: Column, b: Column): Column =
    Bridge.column(VecSub(Bridge.expression(a), Bridge.expression(b)))
}
