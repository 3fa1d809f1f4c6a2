package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Geostationary fixed-grid scan angles → geographic lon/lat as a
  * native codegen expression (SURVEY §2.1 S18) — the column-level twin
  * of [[graft.multimodal.GeosProjection]]'s file-flatten path, for when
  * scan angles already live in table columns (e.g. a persisted ABI cell
  * table keyed by (x, y)).
  *
  * Same GOES-R PUG vol.3 §5.1.2.8.1 math; projection constants are
  * plan-time parameters (defaults: GOES-16 East). Returns
  * struct(lon, lat) degrees, or NULL for off-disk angles (the scan ray
  * misses the ellipsoid) — the SQL-friendly encoding of the remap mask
  * (satellite_utils.py:452-478).
  */
case class GeosToWgs84(left: Expression, right: Expression,
                       lon0Deg: Double, hM: Double,
                       reqM: Double, rpolM: Double)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "geos_to_wgs84"

  override def nullSafeEval(x: Any, y: Any): Any = {
    val r = GeosToWgs84.invert(x.asInstanceOf[Double], y.asInstanceOf[Double],
      lon0Deg, hM, reqM, rpolM)
    if (r == null) null else InternalRow(r(0), r(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rowCls = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val tmp = ctx.freshName("lonlat")
      s"""
         |double[] $tmp = graft.expressions.GeosToWgs84.invert($x, $y,
         |  $lon0Deg, $hM, $reqM, $rpolM);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new $rowCls(new Object[] {
         |    java.lang.Double.valueOf($tmp[0]), java.lang.Double.valueOf($tmp[1]) });
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GeosToWgs84 =
    copy(left = newLeft, right = newRight)
}

object GeosToWgs84 {

  /** Static kernel shared by interpreted eval and generated code;
    * returns {lonDeg, latDeg} or null when off-disk. Mirrors
    * [[graft.multimodal.GeosProjection.invert]] (sweep-x), kept as a
    * flat-double signature for codegen. */
  def invert(x: Double, y: Double, lon0Deg: Double, hM: Double,
             reqM: Double, rpolM: Double): Array[Double] = {
    val sinX = math.sin(x); val cosX = math.cos(x)
    val sinY = math.sin(y); val cosY = math.cos(y)
    val h = hM + reqM
    val rr = (reqM * reqM) / (rpolM * rpolM)
    val a = sinX * sinX + cosX * cosX * (cosY * cosY + rr * sinY * sinY)
    val b = -2.0 * h * cosX * cosY
    val c = h * h - reqM * reqM
    val disc = b * b - 4.0 * a * c
    // !(>= 0) not (< 0): NaN scan angles (e.g. _FillValue coordinate
    // cells) must take the null path too, not leak NaN lat/lon rows
    if (!(disc >= 0.0)) return null
    val rs = (-b - math.sqrt(disc)) / (2.0 * a)
    val sx = rs * cosX * cosY
    val sy = -rs * sinX
    val sz = rs * cosX * sinY
    val lat = math.atan(rr * sz / math.sqrt((h - sx) * (h - sx) + sy * sy))
    val lon = math.toRadians(lon0Deg) - math.atan(sy / (h - sx))
    Array(math.toDegrees(lon), math.toDegrees(lat))
  }

  /** Column API; defaults are GOES-16 East
    * ([[graft.multimodal.GeosProjection.Goes16]]). */
  def geos_to_wgs84(x: Column, y: Column,
                    lon0Deg: Double = -75.0, hM: Double = 35786023.0,
                    reqM: Double = 6378137.0,
                    rpolM: Double = 6356752.31414): Column =
    Bridge.column(GeosToWgs84(
      Bridge.expression(x.cast("double")), Bridge.expression(y.cast("double")),
      lon0Deg, hM, reqM, rpolM))
}
