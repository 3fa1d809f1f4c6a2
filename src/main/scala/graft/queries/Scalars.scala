package graft.queries

import graft.Tables
import graft.core.SchemaNormalizer
import graft.expressions.Unaccent.unaccent
import graft.transforms.{Clean, Nest, Timestamps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.8 F1–F20) as oracle-checked queries.
  * Accented input is synthesized via replace() so the unaccent/slug path
  * has real work to do on the ASCII-only testdata. */
object Scalars {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1/F2/U1: unaccent + slugify on values (custom Catalyst expression).
    "q40_slugify" -> ((s, dir) => {
      t(s, dir, "customer")
        .withColumn("accented", regexp_replace(col("c_name"), "Customer", "Çüstömér"))
        .select(col("c_custkey"),
          unaccent(col("accented")).as("unaccented"),
          SchemaNormalizer.slugify(col("accented")).as("slug"))
        .orderBy(col("c_custkey"))
    }),
    // F3/F4/F7: trim + capitalize + value-replace map.
    "q41_clean_categories" -> ((s, dir) => {
      val df = t(s, dir, "events")
        .withColumn("padded", concat(lit("  "), col("event_type"), lit(" ")))
      // trimStrings trims every string column, so `padded` is clean again.
      val cleaned = Clean.trimStrings(df, exclude = Set("props"))
      cleaned.select(col("event_id"),
          Clean.capitalize(col("padded")).as("category"),
          Clean.replaceValues(col("padded"),
            Map("error" -> Some("erro"), "view" -> None)).as("mapped"))
        .orderBy(col("event_id"))
    }),
    // F8: dual-format timestamp parse with fallback (library parseMulti).
    "q42_multiformat_parse" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("s", when(col("event_id") % 2 === 0,
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
          .otherwise(date_format(col("ts"), "dd/MM/yyyy HH:mm:ss")))
        .select(col("event_id"),
          Timestamps.parseMulti(col("s"),
            Seq("yyyy-MM-dd HH:mm:ss", "dd/MM/yyyy HH:mm:ss")).as("parsed"))
        .orderBy(col("event_id"))
    }),
    // F9/F10/F11: epoch-millis roundtrip, strftime, interval arithmetic.
    "q43_epoch_roundtrip" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("ms", unix_millis(col("ts")))
        .select(col("event_id"),
          col("ms"),
          Timestamps.fromEpochMillis(col("ms")).as("ts_rt"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("iso_str"),
          Timestamps.minusMinutes(col("ts"), 90).as("ts_minus_90m"))
        .orderBy(col("event_id"))
    }),
    // F12/F13: safe cast with default + numeric coerce/clamp.
    "q44_safe_cast" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          Clean.safeCast(substring(col("o_orderpriority"), 1, 1), "int", lit(-1))
            .as("prio_num"),
          Clean.safeCast(col("o_orderstatus"), "int", lit(-1)).as("status_num"),
          Clean.coerceNonNegative(col("o_totalprice") - 200000).as("over_200k"))
        .orderBy(col("o_orderkey"))
    }),
    // F14/U5: row-wise JSON pack (Nest.toContent).
    "q45_json_pack" -> ((s, dir) => {
      Nest.toContent(
          t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
          pk = Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),
    // U5: grouped JSON pack — one ordered JSON array per key.
    "q46_grouped_json" -> ((s, dir) => {
      Nest.toGroupedContent(
          t(s, dir, "events").select(col("user_id"), col("event_id"), col("event_type")),
          pk = Seq("user_id"), orderCols = Seq("event_id"))
        .orderBy(col("user_id"))
    }),
    // F15: JSON parse/extract + aggregate over extracted field.
    "q47_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    }),
    // F5/F6: regex extract + control-scrub + nullif chain.
    "q48_regex_scrub" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          regexp_extract(col("props"), "[0-9]+", 0).as("digits"),
          Clean.scrub(regexp_replace(col("props"), "[^0-9]", "")).as("scrubbed"))
        .orderBy(col("event_id"))
    }),
    // J6/U3: point-in-polygon spatial join. DuckDB has no spatial
    // extension offline, so the polygon is a rectangle whose bounds have
    // a 4th decimal the 3-decimal data can never hit — the ray-casting
    // UDF's answer then equals a strict bbox predicate the oracle CAN
    // express (general-polygon semantics are covered by ConnectorsSpec).
    "q64_point_in_polygon" -> ((s, dir) => {
      val poly = graft.functions.GeoOps.parsePolygonWkt(
        "POLYGON ((-43.9995 -23.4995, -42.5005 -23.4995, -42.5005 -22.0005, -43.9995 -22.0005, -43.9995 -23.4995))")
      val pts = t(s, dir, "customer").select(
        col("c_custkey"),
        (lit(-44.5) + (col("c_acctbal") % 25) / 10).as("lon"),
        (lit(-23.8) + (col("c_custkey") % 20).cast("double") / 10).as("lat"))
      pts.filter(graft.functions.GeoOps.pointInPolygon(s, poly)(col("lon"), col("lat")))
        .orderBy(col("c_custkey"))
    }),
    // F17: CRS reprojection — UTM zone 23S (EPSG:31983) easting/northing
    // back to EPSG:4326 lon/lat via the closed-form Snyder inverse, as a
    // codegen expression. The oracle replicates the identical series in
    // DuckDB arithmetic; both sides round to 1e-6 deg (~0.1 m), far
    // coarser than the formulas' 1e-12 cross-engine agreement.
    "q89_crs_reproject" -> ((s, dir) => {
      val df = t(s, dir, "events")
        .withColumn("easting",
          lit(600000.0) + (col("event_id") % 100000).cast("double"))
        .withColumn("northing",
          lit(7430000.0) + (col("user_id") % 50000).cast("double"))
      df.withColumn("ll",
          graft.functions.GeoOps.utmToWgs84(col("easting"), col("northing")))
        .select(col("event_id"), col("easting"), col("northing"),
          round(col("ll.lon"), 6).as("lon"),
          round(col("ll.lat"), 6).as("lat"))
        .orderBy(col("event_id"))
    }),
    // S18: geostationary fixed-grid → lon/lat as a column expression
    // (GOES-R PUG 5.1.2.8.1), off-disk scan angles → NULL. Oracle
    // replicates the quadratic + atan chain in DuckDB arithmetic.
    "q90_geos_remap" -> ((s, dir) => {
      val df = t(s, dir, "events")
        .withColumn("x", (col("event_id") % 400 - 200).cast("double") / 1000.0)
        .withColumn("y", (col("user_id") % 300 - 150).cast("double") / 1000.0)
      df.withColumn("ll",
          graft.expressions.GeosToWgs84.geos_to_wgs84(col("x"), col("y")))
        .select(col("event_id"), col("x"), col("y"),
          round(col("ll.lon"), 6).as("lon"),
          round(col("ll.lat"), 6).as("lat"))
        .orderBy(col("event_id"))
    }),
    // F18: bbox-membership filter (between on two numeric columns).
    "q49_bbox_filter" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_acctbal").between(0, 5000) &&
          col("c_nationkey").between(5, 15))
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q40_slugify" ->
      """SELECT c_custkey,
        |  strip_accents(replace(c_name, 'Customer', 'Çüstömér')) AS unaccented,
        |  regexp_replace(regexp_replace(
        |    lower(strip_accents(trim(replace(c_name, 'Customer', 'Çüstömér')))),
        |    '[\s/\\.-]+', '_', 'g'), '[^a-z0-9_]', '', 'g') AS slug
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q41_clean_categories" ->
      """SELECT event_id,
        |  upper(substr(trim('  ' || event_type || ' '), 1, 1)) ||
        |    lower(substr(trim('  ' || event_type || ' '), 2)) AS category,
        |  CASE WHEN trim('  ' || event_type || ' ') = 'error' THEN 'erro'
        |       WHEN trim('  ' || event_type || ' ') = 'view' THEN NULL
        |       ELSE trim('  ' || event_type || ' ') END AS mapped
        |FROM events ORDER BY event_id""".stripMargin,
    "q42_multiformat_parse" ->
      """SELECT event_id,
        |  COALESCE(
        |    try_strptime(s, '%Y-%m-%d %H:%M:%S'),
        |    try_strptime(s, '%d/%m/%Y %H:%M:%S')) AS parsed
        |FROM (SELECT event_id,
        |  CASE WHEN event_id % 2 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
        |       ELSE strftime(ts, '%d/%m/%Y %H:%M:%S') END AS s
        |  FROM events) ORDER BY event_id""".stripMargin,
    "q43_epoch_roundtrip" ->
      """SELECT event_id, epoch_ms(date_trunc('ms', ts)) AS ms,
        |  epoch_ms(epoch_ms(date_trunc('ms', ts))) AS ts_rt,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso_str,
        |  ts - INTERVAL 90 MINUTES AS ts_minus_90m
        |FROM events ORDER BY event_id""".stripMargin,
    "q44_safe_cast" ->
      """SELECT o_orderkey,
        |  COALESCE(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT), -1) AS prio_num,
        |  COALESCE(TRY_CAST(o_orderstatus AS INT), -1) AS status_num,
        |  CASE WHEN o_totalprice - 200000 < 0 THEN NULL
        |       ELSE o_totalprice - 200000 END AS over_200k
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q45_json_pack" ->
      """SELECT c_custkey,
        |  to_json(struct_pack(c_name := c_name, c_mktsegment := c_mktsegment))
        |    AS content
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q46_grouped_json" ->
      """SELECT user_id,
        |  to_json(list(struct_pack(event_id := event_id,
        |    event_type := event_type) ORDER BY event_id)) AS content
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q47_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
        |    AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q48_regex_scrub" ->
      """SELECT event_id, regexp_extract(props, '[0-9]+') AS digits,
        |  nullif(nullif(nullif(regexp_replace(
        |    regexp_replace(props, '[^0-9]', '', 'g'),
        |    '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'), 'None'), 'nan'), '')
        |    AS scrubbed
        |FROM events ORDER BY event_id""".stripMargin,
    "q64_point_in_polygon" ->
      """SELECT c_custkey, lon, lat FROM (
        |  SELECT c_custkey,
        |    -44.5 + (c_acctbal % 25) / 10 AS lon,
        |    -23.8 + CAST(c_custkey % 20 AS DOUBLE) / 10 AS lat
        |  FROM customer)
        |WHERE lon > -43.9995 AND lon < -42.5005
        |  AND lat > -23.4995 AND lat < -22.0005
        |ORDER BY c_custkey""".stripMargin,
    "q49_bbox_filter" ->
      """SELECT c_custkey, c_acctbal, c_nationkey FROM customer
        |WHERE c_acctbal BETWEEN 0 AND 5000 AND c_nationkey BETWEEN 5 AND 15
        |ORDER BY c_custkey""".stripMargin,
    // Same Snyder inverse-TM series as graft.expressions.UtmToWgs84,
    // spelled out in SQL (GRS80: a=6378137, 1/f=298.257222101; UTM:
    // k0=0.9996, FE=500000, FN=10000000, lon0=-45 for zone 23S).
    "q89_crs_reproject" ->
      """WITH src AS (
        |  SELECT event_id,
        |    600000.0 + CAST(event_id % 100000 AS DOUBLE) AS easting,
        |    7430000.0 + CAST(user_id % 50000 AS DOUBLE) AS northing
        |  FROM events),
        |c1 AS (SELECT 1.0/298.257222101 AS fl),
        |c2 AS (SELECT fl, fl*(2.0-fl) AS e2 FROM c1),
        |c3 AS (SELECT e2, e2/(1.0-e2) AS ep2,
        |    (1.0-sqrt(1.0-e2))/(1.0+sqrt(1.0-e2)) AS e1 FROM c2),
        |s1 AS (SELECT event_id, easting, northing, e2, ep2, e1,
        |    ((northing - 10000000.0)/0.9996) /
        |      (6378137.0*(1.0 - e2/4.0 - 3.0*e2*e2/64.0 - 5.0*e2*e2*e2/256.0)) AS mu
        |  FROM src, c3),
        |s2 AS (SELECT *, mu
        |    + (3.0*e1/2.0 - 27.0*e1*e1*e1/32.0)*sin(2.0*mu)
        |    + (21.0*e1*e1/16.0 - 55.0*e1*e1*e1*e1/32.0)*sin(4.0*mu)
        |    + (151.0*e1*e1*e1/96.0)*sin(6.0*mu)
        |    + (1097.0*e1*e1*e1*e1/512.0)*sin(8.0*mu) AS phi1
        |  FROM s1),
        |s3 AS (SELECT *, sin(phi1) AS sp, cos(phi1) AS cp,
        |    sin(phi1)/cos(phi1) AS tp FROM s2),
        |s4 AS (SELECT *, ep2*cp*cp AS cc1, tp*tp AS t1,
        |    1.0 - e2*sp*sp AS om FROM s3),
        |s5 AS (SELECT *, 6378137.0/sqrt(om) AS n1,
        |    6378137.0*(1.0-e2)/(om*sqrt(om)) AS r1 FROM s4),
        |s6 AS (SELECT *, (easting - 500000.0)/(n1*0.9996) AS d FROM s5),
        |s7 AS (SELECT *, d*d AS d2 FROM s6)
        |SELECT event_id, easting, northing,
        |  round(degrees(radians(-45.0) + (d - (1.0+2.0*t1+cc1)*d2*d/6.0
        |    + (5.0 - 2.0*cc1 + 28.0*t1 - 3.0*cc1*cc1 + 8.0*ep2
        |       + 24.0*t1*t1)*d2*d2*d/120.0)/cp), 6) AS lon,
        |  round(degrees(phi1 - (n1*tp/r1)*(d2/2.0
        |    - (5.0 + 3.0*t1 + 10.0*cc1 - 4.0*cc1*cc1 - 9.0*ep2)*d2*d2/24.0
        |    + (61.0 + 90.0*t1 + 298.0*cc1 + 45.0*t1*t1 - 252.0*ep2
        |       - 3.0*cc1*cc1)*d2*d2*d2/720.0)), 6) AS lat
        |FROM s7 ORDER BY event_id""".stripMargin,
    // GOES-R PUG 5.1.2.8.1 inverse, spelled out (GOES-16: lon0=-75,
    // h=35786023 above surface so H=42164160 from center, GRS80 axes).
    "q90_geos_remap" ->
      """WITH src AS (
        |  SELECT event_id,
        |    CAST(event_id % 400 - 200 AS DOUBLE)/1000.0 AS x,
        |    CAST(user_id % 300 - 150 AS DOUBLE)/1000.0 AS y
        |  FROM events),
        |t0 AS (SELECT CAST(6378137.0 AS DOUBLE) AS req,
        |    CAST(6356752.31414 AS DOUBLE) AS rpol,
        |    CAST(35786023.0 AS DOUBLE) AS hm),
        |t1 AS (SELECT event_id, x, y, req,
        |    sin(x) AS sinx, cos(x) AS cosx, sin(y) AS siny, cos(y) AS cosy,
        |    hm + req AS h,
        |    (req*req)/(rpol*rpol) AS rr
        |  FROM src, t0),
        |t2 AS (SELECT *,
        |    sinx*sinx + cosx*cosx*(cosy*cosy + rr*siny*siny) AS a,
        |    -2.0*h*cosx*cosy AS b,
        |    h*h - req*req AS c
        |  FROM t1),
        |t3 AS (SELECT *, b*b - 4.0*a*c AS disc FROM t2),
        |t4 AS (SELECT *,
        |    CASE WHEN disc >= 0.0 THEN (-b - sqrt(disc))/(2.0*a) END AS rs
        |  FROM t3),
        |t5 AS (SELECT *, rs*cosx*cosy AS sx, -rs*sinx AS sy, rs*cosx*siny AS sz
        |  FROM t4)
        |SELECT event_id, x, y,
        |  round(degrees(radians(-75.0) - atan(sy/(h - sx))), 6) AS lon,
        |  round(degrees(atan(rr*sz/sqrt((h - sx)*(h - sx) + sy*sy))), 6) AS lat
        |FROM t5 ORDER BY event_id""".stripMargin
  )
}
