package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** All ordered pairs (i < j) of a sorted array, as
  * array<struct<id_a, id_b>> — the in-bucket candidate expansion of LSH
  * banding.
  *
  * The composable encoding
  * `flatten(transform(ids, (x,i) -> transform(slice(ids,i+2,n), …)))`
  * is interpreted (higher-order functions are CodegenFallback) and
  * `slice` allocates a fresh array PER ELEMENT — O(k²) interpreter
  * dispatch and allocation per bucket, on a frame with one row per
  * populated band bucket (O(corpus) rows). This is one flat loop feeding
  * `explode` (which GenerateExec codegens over any child expression), so
  * the whole pair expansion stays inside whole-stage codegen. */
case class SortedPairs(child: Expression) extends UnaryExpression {

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  // pair fields inherit the input array's element nullability — an
  // array that may hold nulls (collect_list, literals) must not declare
  // non-null fields or downstream codegen reads garbage instead of null
  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", elementType, nullable = elemNullable),
      StructField("id_b", elementType, nullable = elemNullable))),
    containsNull = false)

  override def prettyName: String = "sorted_pairs"

  override protected def nullSafeEval(v: Any): Any =
    SortedPairs.compute(v.asInstanceOf[ArrayData], elementType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elementType)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SortedPairs.compute($c, $et);")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object SortedPairs {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, et: DataType): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.get(i, et)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.get(j, et)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def sorted_pairs(c: Column): Column =
    Bridge.column(SortedPairs(Bridge.expression(c)))
}
