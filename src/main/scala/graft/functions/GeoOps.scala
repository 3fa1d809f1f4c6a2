package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial layer (SURVEY §1.1, §2.8 F17/F18, §2.10 U3/U4, §2.4 J6).
  *
  * The reference keeps geometry as WKT strings and needs exactly three
  * capabilities: 3D→2D cleanup (dump_datario/tasks.py:141-158 +
  * remove_third_dimension), bbox membership
  * (georeference `check_if_belongs_to_rio`), and point-in-polygon
  * (georeference/tasks.py:129-133, waze/tasks.py:116-122). We keep the
  * same WKT-string data model; pip is a UDF over a broadcast-closed
  * polygon (small build side — the polygon travels with the closure, the
  * points never leave their partitions).
  */
object GeoOps {

  /** F17: drop the Z coordinate from WKT text: "1 2 3" triples → "1 2".
    * Works for POINT/LINESTRING/POLYGON Z-variants. */
  def dropZ(wkt: Column): Column =
    regexp_replace(
      regexp_replace(wkt, "\\s+Z\\s*\\(", " ("),
      "(-?\\d+(?:\\.\\d+)?)\\s+(-?\\d+(?:\\.\\d+)?)\\s+-?\\d+(?:\\.\\d+)?(\\s*[,)])",
      "$1 $2$3")

  /** WKT POINT constructor / accessors as plain expressions. */
  def wktPoint(lon: Column, lat: Column): Column =
    concat(lit("POINT ("), lon.cast("string"), lit(" "), lat.cast("string"), lit(")"))

  def pointLon(wkt: Column): Column =
    regexp_extract(wkt, "POINT\\s*\\((-?\\d+(?:\\.\\d+)?)\\s", 1).cast("double")

  def pointLat(wkt: Column): Column =
    regexp_extract(wkt, "POINT\\s*\\(-?\\d+(?:\\.\\d+)?\\s+(-?\\d+(?:\\.\\d+)?)", 1)
      .cast("double")

  /** F18: Rio-de-Janeiro-ish bounding box (the reference's cheap filter). */
  def inBbox(lon: Column, lat: Column,
             minLon: Double, minLat: Double,
             maxLon: Double, maxLat: Double): Column =
    lon.between(minLon, maxLon) && lat.between(minLat, maxLat)

  /** Parse a simple WKT POLYGON's outer ring into (x, y) vertices
    * (driver-side: polygons are config, not data). */
  def parsePolygonWkt(wkt: String): Array[(Double, Double)] = {
    val inner = wkt.replaceAll("(?i)POLYGON\\s*\\(\\(", "")
      .takeWhile(_ != ')')
    inner.split(",").map { pair =>
      val xs = pair.trim.split("\\s+")
      (xs(0).toDouble, xs(1).toDouble)
    }
  }

  /** U3/J6: even-odd ray-casting point-in-polygon — a native codegen
    * expression ([[graft.expressions.PointInPolygon]]): the polygon is a
    * plan-time constant referenced by the generated class, so the filter
    * stays inside whole-stage codegen instead of a boxing UDF call per
    * row. Null coordinates yield null (dropped by filters, as before). */
  def pointInPolygon(spark: SparkSession, polygon: Array[(Double, Double)])
                    (lon: Column, lat: Column): Column =
    graft.expressions.PointInPolygon.point_in_polygon(lon, lat, polygon)

  /** F17 (second half): CRS reprojection — UTM easting/northing →
    * EPSG:4326 lon/lat, the reference's `to_crs("epsg:4326")` on every
    * dump_datario geo table (utils/dump_datario/tasks.py:123-131).
    * Defaults to EPSG:31983 (SIRGAS 2000 / UTM zone 23S, Rio's grid).
    * Closed-form codegen expression — see
    * [[graft.expressions.UtmToWgs84]]. Returns struct(lon, lat). */
  def utmToWgs84(easting: Column, northing: Column,
                 zone: Int = 23, southern: Boolean = true): Column =
    graft.expressions.UtmToWgs84.utm_to_wgs84(easting, northing, zone, southern)
}
