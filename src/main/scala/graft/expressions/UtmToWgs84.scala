package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Inverse transverse-Mercator (UTM easting/northing → geographic
  * lon/lat) as a native codegen expression — the engine's CRS
  * reprojection (SURVEY §2.8 F17 second half).
  *
  * The reference reprojects every geo table it dumps to EPSG:4326
  * (`utils/dump_datario/tasks.py:123-131`, `gdf.to_crs("epsg:4326")`,
  * sources arrive in the SIRGAS-2000 / UTM-zone-23S family,
  * EPSG:31983). GeoPandas delegates to PROJ; at Spark scale we want the
  * conversion inside whole-stage codegen, one closed-form kernel call
  * per row with zero allocation beyond the output struct. We use
  * Snyder's series (Map Projections — A Working Manual, USGS PP 1395,
  * eqs. 8-18..8-25 + 3-26), accurate to well under a millimetre inside
  * a UTM zone — far below the source data's own precision.
  *
  * Ellipsoid/grid constants are plan-time parameters (defaults:
  * GRS80/SIRGAS-2000, zone 23 south — Rio de Janeiro's grid), so the
  * generated code sees them as compile-time doubles.
  *
  * Returns struct(lon double, lat double) in degrees.
  */
case class UtmToWgs84(left: Expression, right: Expression,
                      a: Double, invF: Double, k0: Double,
                      falseEasting: Double, falseNorthing: Double,
                      lon0Deg: Double)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false)))
  override def prettyName: String = "utm_to_wgs84"

  override def nullSafeEval(e: Any, n: Any): Any = {
    val r = UtmToWgs84.invert(e.asInstanceOf[Double], n.asInstanceOf[Double],
      a, invF, k0, falseEasting, falseNorthing, lon0Deg)
    InternalRow(r(0), r(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rowCls = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
    nullSafeCodeGen(ctx, ev, (e, n) => {
      val tmp = ctx.freshName("lonlat")
      s"""
         |double[] $tmp = graft.expressions.UtmToWgs84.invert($e, $n,
         |  $a, $invF, $k0, $falseEasting, $falseNorthing, $lon0Deg);
         |${ev.value} = new $rowCls(new Object[] {
         |  java.lang.Double.valueOf($tmp[0]), java.lang.Double.valueOf($tmp[1]) });
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UtmToWgs84 =
    copy(left = newLeft, right = newRight)
}

object UtmToWgs84 {
  /** GRS80 semi-major axis / inverse flattening (SIRGAS 2000 == WGS84
    * to within observational noise, so "to EPSG:4326" is the datum
    * identity + projection inverse). */
  val Grs80A = 6378137.0
  val Grs80InvF = 298.257222101
  val UtmK0 = 0.9996
  val UtmFalseEasting = 500000.0
  val UtmFalseNorthingSouth = 10000000.0

  /** Static kernel shared by interpreted eval and generated code.
    * Returns {lonDeg, latDeg}. Snyder PP 1395 inverse TM series. */
  def invert(easting: Double, northing: Double,
             a: Double, invF: Double, k0: Double,
             fe: Double, fn: Double, lon0Deg: Double): Array[Double] = {
    val f = 1.0 / invF
    val e2 = f * (2.0 - f)
    val ep2 = e2 / (1.0 - e2)
    val m = (northing - fn) / k0
    val mu = m / (a * (1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0 -
      5.0 * e2 * e2 * e2 / 256.0))
    val sq = math.sqrt(1.0 - e2)
    val e1 = (1.0 - sq) / (1.0 + sq)
    val phi1 = mu +
      (3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0) * math.sin(2.0 * mu) +
      (21.0 * e1 * e1 / 16.0 - 55.0 * e1 * e1 * e1 * e1 / 32.0) * math.sin(4.0 * mu) +
      (151.0 * e1 * e1 * e1 / 96.0) * math.sin(6.0 * mu) +
      (1097.0 * e1 * e1 * e1 * e1 / 512.0) * math.sin(8.0 * mu)
    val sinP = math.sin(phi1)
    val cosP = math.cos(phi1)
    val tanP = sinP / cosP
    val c1 = ep2 * cosP * cosP
    val t1 = tanP * tanP
    val oneMinus = 1.0 - e2 * sinP * sinP
    val n1 = a / math.sqrt(oneMinus)
    val r1 = a * (1.0 - e2) / (oneMinus * math.sqrt(oneMinus))
    val d = (easting - fe) / (n1 * k0)
    val d2 = d * d
    val lat = phi1 - (n1 * tanP / r1) * (d2 / 2.0 -
      (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * ep2) * d2 * d2 / 24.0 +
      (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 - 252.0 * ep2 -
        3.0 * c1 * c1) * d2 * d2 * d2 / 720.0)
    val lon = math.toRadians(lon0Deg) + (d -
      (1.0 + 2.0 * t1 + c1) * d2 * d / 6.0 +
      (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * ep2 +
        24.0 * t1 * t1) * d2 * d2 * d / 120.0) / cosP
    Array(math.toDegrees(lon), math.toDegrees(lat))
  }

  /** Forward transverse Mercator (lat/lon degrees → easting/northing).
    * Snyder eqs. 8-9..8-15. Used by specs for round-trip verification
    * and by callers that need to project INTO the grid. */
  def forward(lonDeg: Double, latDeg: Double,
              a: Double = Grs80A, invF: Double = Grs80InvF, k0: Double = UtmK0,
              fe: Double = UtmFalseEasting, fn: Double = UtmFalseNorthingSouth,
              lon0Deg: Double = -45.0): (Double, Double) = {
    val f = 1.0 / invF
    val e2 = f * (2.0 - f)
    val ep2 = e2 / (1.0 - e2)
    val phi = math.toRadians(latDeg)
    val sinP = math.sin(phi)
    val cosP = math.cos(phi)
    val tanP = sinP / cosP
    val n = a / math.sqrt(1.0 - e2 * sinP * sinP)
    val t = tanP * tanP
    val c = ep2 * cosP * cosP
    val bigA = math.toRadians(lonDeg - lon0Deg) * cosP
    def mOf(p: Double): Double =
      a * ((1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0 - 5.0 * e2 * e2 * e2 / 256.0) * p -
        (3.0 * e2 / 8.0 + 3.0 * e2 * e2 / 32.0 + 45.0 * e2 * e2 * e2 / 1024.0) * math.sin(2.0 * p) +
        (15.0 * e2 * e2 / 256.0 + 45.0 * e2 * e2 * e2 / 1024.0) * math.sin(4.0 * p) -
        (35.0 * e2 * e2 * e2 / 3072.0) * math.sin(6.0 * p))
    val a2 = bigA * bigA
    val easting = fe + k0 * n * (bigA + (1.0 - t + c) * a2 * bigA / 6.0 +
      (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * ep2) * a2 * a2 * bigA / 120.0)
    val northing = fn + k0 * (mOf(phi) + n * tanP * (a2 / 2.0 +
      (5.0 - t + 9.0 * c + 4.0 * c * c) * a2 * a2 / 24.0 +
      (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * ep2) * a2 * a2 * a2 / 720.0))
    (easting, northing)
  }

  /** Column API: struct(lon, lat) from UTM (easting, northing).
    * Defaults: EPSG:31983 (SIRGAS 2000 / UTM zone 23S — Rio's grid). */
  def utm_to_wgs84(easting: Column, northing: Column,
                   zone: Int = 23, southern: Boolean = true,
                   a: Double = Grs80A, invF: Double = Grs80InvF): Column = {
    require(zone >= 1 && zone <= 60, s"UTM zone out of range: $zone")
    val lon0 = -183.0 + 6.0 * zone
    Bridge.column(UtmToWgs84(
      Bridge.expression(easting.cast("double")),
      Bridge.expression(northing.cast("double")),
      a, invF, UtmK0, UtmFalseEasting,
      if (southern) UtmFalseNorthingSouth else 0.0, lon0))
  }
}
