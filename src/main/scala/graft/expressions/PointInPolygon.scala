package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Even-odd ray-casting point-in-polygon as a native codegen expression
  * (SURVEY §2.10 U3, §2.4 J6 — the georeference hot path).
  *
  * The polygon is a plan-time constant (config, not data): its vertices
  * ride as referenced arrays in the generated class, so the per-row work
  * is one static-call O(vertices) loop inside whole-stage codegen — no
  * UDF serialization, no row boxing, and the geo filter no longer splits
  * the codegen span of scans that use it. */
case class PointInPolygon(left: Expression, right: Expression,
                          xs: Array[Double], ys: Array[Double])
    extends BinaryExpression {
  require(xs.length == ys.length && xs.length >= 3, "polygon needs >= 3 vertices")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    PointInPolygon.contains(lon.asInstanceOf[Double], lat.asInstanceOf[Double], xs, ys)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xsRef = ctx.addReferenceObj("polyXs", xs)
    val ysRef = ctx.addReferenceObj("polyYs", ys)
    nullSafeCodeGen(ctx, ev, (lon, lat) =>
      s"${ev.value} = graft.expressions.PointInPolygon.contains($lon, $lat, $xsRef, $ysRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PointInPolygon =
    copy(left = newLeft, right = newRight)
}

object PointInPolygon {
  /** Static kernel shared by interpreted eval and generated code. */
  def contains(x: Double, y: Double, xs: Array[Double], ys: Array[Double]): Boolean = {
    var inside = false
    var i = 0
    var j = xs.length - 1
    while (i < xs.length) {
      if ((ys(i) > y) != (ys(j) > y) &&
        x < (xs(j) - xs(i)) * (y - ys(i)) / (ys(j) - ys(i)) + xs(i))
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  def point_in_polygon(lon: Column, lat: Column,
                       polygon: Array[(Double, Double)]): Column =
    Bridge.column(PointInPolygon(
      Bridge.expression(lon.cast("double")), Bridge.expression(lat.cast("double")),
      polygon.map(_._1), polygon.map(_._2)))
}
