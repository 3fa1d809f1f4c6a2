package graft

import graft.expressions.UtmToWgs84
import graft.functions.GeoOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** CRS reprojection (F17 second half): inverse transverse Mercator
  * EPSG:31983 (SIRGAS 2000 / UTM 23S) → EPSG:4326, mirroring the
  * reference's to_crs("epsg:4326") on every dump_datario geo table
  * (utils/dump_datario/tasks.py:123-131). */
class GeoProjSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  test("grid origin anchors exactly: (FE, FN) → (lon0, equator)") {
    // E=500000, N=10000000 is the zone-23S natural origin: lon=-45, lat=0.
    val r = UtmToWgs84.invert(500000.0, 10000000.0,
      UtmToWgs84.Grs80A, UtmToWgs84.Grs80InvF, UtmToWgs84.UtmK0,
      500000.0, 10000000.0, -45.0)
    assert(math.abs(r(0) - -45.0) < eps, s"lon ${r(0)}")
    assert(math.abs(r(1) - 0.0) < eps, s"lat ${r(1)}")
  }

  test("forward∘inverse round-trips Rio control points to sub-meter") {
    // Surveyed-precision round trip: the forward series (Snyder 8-9..8-15)
    // is written independently of the inverse (8-18..8-25); agreement to
    // <1e-6 deg (~0.1 m) across the zone catches any constant/term slip.
    val pts = Seq(
      (-43.2105, -22.9519), // Corcovado
      (-43.1729, -22.9068), // city center
      (-43.6957, -22.9035), // Santa Cruz (zone edge, D large)
      (-42.8000, -23.0700), // Maricá-ish east
      (-44.5000, -23.2000), // west edge
      (-43.3000, -21.5000)) // inland north
    pts.foreach { case (lon, lat) =>
      val (e, n) = UtmToWgs84.forward(lon, lat)
      val r = UtmToWgs84.invert(e, n,
        UtmToWgs84.Grs80A, UtmToWgs84.Grs80InvF, UtmToWgs84.UtmK0,
        500000.0, 10000000.0, -45.0)
      assert(math.abs(r(0) - lon) < 1e-6, s"lon $lon → ${r(0)}")
      assert(math.abs(r(1) - lat) < 1e-6, s"lat $lat → ${r(1)}")
    }
  }

  test("codegen path == interpreted kernel, nulls propagate") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (687000.0, 7460000.0), (612000.0, 7630000.0), (null, 7460000.0))
      .toDF("e", "n")
      .select(col("e"), col("n"),
        GeoOps.utmToWgs84(col("e"), col("n")).as("ll"))
    val rows = df.select(col("e"), col("n"), col("ll.lon"), col("ll.lat"))
      .collect()
    rows.take(2).foreach { r =>
      val exp = UtmToWgs84.invert(r.getDouble(0), r.getDouble(1),
        UtmToWgs84.Grs80A, UtmToWgs84.Grs80InvF, UtmToWgs84.UtmK0,
        500000.0, 10000000.0, -45.0)
      assert(r.getDouble(2) == exp(0) && r.getDouble(3) == exp(1))
    }
    assert(rows(2).isNullAt(2) && rows(2).isNullAt(3))
  }

  test("utm_to_wgs84 is SQL-addressable via extensions (§7.9)") {
    graft.expressions.GraftExtensions.install(spark)
    val Row(lon: Double, lat: Double) =
      spark.sql("SELECT utm_to_wgs84(CAST(500000.0 AS DOUBLE), CAST(10000000.0 AS DOUBLE)) AS ll")
        .select("ll.lon", "ll.lat").head()
    assert(math.abs(lon - -45.0) < eps && math.abs(lat) < eps)
    // zone + hemisphere args: zone 33 NORTH origin → lon0=15, equator
    val Row(lonN: Double, latN: Double) = spark.sql(
      "SELECT utm_to_wgs84(CAST(500000.0 AS DOUBLE), CAST(0.0 AS DOUBLE), 33, false) AS ll")
      .select("ll.lon", "ll.lat").head()
    assert(math.abs(lonN - 15.0) < eps && math.abs(latN) < eps)
    // out-of-range zone is rejected at function build, not silently used
    val err = intercept[Exception] {
      spark.sql("SELECT utm_to_wgs84(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE), 99) AS ll")
        .collect()
    }
    assert(err.getMessage.contains("zone") ||
      Option(err.getCause).exists(_.getMessage.contains("zone")), err.toString)
    // SQL callers pass whatever numeric type they have — int literals
    // and decimals coerce like the Column API instead of crashing
    val Row(lonI: Double, latI: Double) =
      spark.sql("SELECT utm_to_wgs84(500000, 10000000) AS ll")
        .select("ll.lon", "ll.lat").head()
    assert(math.abs(lonI - -45.0) < eps && math.abs(latI) < eps)
    val Row(lonG: Double, _) =
      spark.sql("SELECT geos_to_wgs84(0, 0) AS ll").select("ll.lon", "ll.lat").head()
    assert(math.abs(lonG - -75.0) < eps)
    // EXTRA args are rejected, not silently dropped: a caller passing
    // projection constants must not get the fixed defaults
    val extraU = intercept[Exception] {
      spark.sql("SELECT utm_to_wgs84(1.0, 2.0, 23, true, 99.0) AS ll").collect()
    }
    assert(extraU.getMessage.contains("args") ||
      Option(extraU.getCause).exists(_.getMessage.contains("args")), extraU.toString)
    val extraG = intercept[Exception] {
      spark.sql("SELECT geos_to_wgs84(1.0, 2.0, -137.0) AS ll").collect()
    }
    assert(extraG.getMessage.contains("args") ||
      Option(extraG.getCause).exists(_.getMessage.contains("args")), extraG.toString)
  }

  test("northern-hemisphere variant: FN=0 at the equator") {
    val r = UtmToWgs84.invert(500000.0, 0.0,
      UtmToWgs84.Grs80A, UtmToWgs84.Grs80InvF, UtmToWgs84.UtmK0,
      500000.0, 0.0, -45.0)
    assert(math.abs(r(1)) < eps)
  }

  // ---- GOES-16 geostationary fixed-grid remap (S18 second half) ----
  import graft.multimodal.GeosProjection

  test("geos inverse anchors at the sub-satellite point; off-disk is null") {
    val ll = GeosProjection.invert(0.0, 0.0, GeosProjection.Goes16)
    assert(math.abs(ll(0)) < eps && math.abs(ll(1) - -75.0) < eps)
    // disk edge is asin(req/(h+req)) ≈ 0.1519 rad — 0.16 misses earth
    assert(GeosProjection.invert(0.16, 0.0, GeosProjection.Goes16) == null)
    // far side of the planet is not visible to the satellite
    assert(GeosProjection.forward(120.0, 0.0, GeosProjection.Goes16) == null)
    // NaN scan angles (fill-valued coordinate cells) take the null path
    // too — they must never leak NaN lat/lon rows
    assert(GeosProjection.invert(Double.NaN, 0.0, GeosProjection.Goes16) == null)
    assert(GeosProjection.invert(0.0, Double.NaN, GeosProjection.Goes16) == null)
  }

  test("geos forward∘inverse round-trips across the visible disk") {
    val pts = Seq((-43.2, -22.9), (-75.0, 0.0), (-100.0, 40.0),
      (-35.0, -8.0), (-60.0, -55.0))
    pts.foreach { case (lon, lat) =>
      val xy = GeosProjection.forward(lon, lat, GeosProjection.Goes16)
      assert(xy != null, s"($lon,$lat) should be visible")
      val ll = GeosProjection.invert(xy(0), xy(1), GeosProjection.Goes16)
      assert(math.abs(ll(0) - lat) < 1e-9, s"lat $lat → ${ll(0)}")
      assert(math.abs(ll(1) - lon) < 1e-9, s"lon $lon → ${ll(1)}")
    }
  }

  test("ABI-shaped CDF fixture: params, remap, fill and off-disk cells") {
    val bytes = abiFixture
    val nc = graft.multimodal.NetCdf.parseHeader(bytes)
    val p = GeosProjection.fromNc(nc)
    assert(p.lon0Deg === -75.0 && p.hM === 35786023.0 && p.sweepX)
    assert(p.reqM === 6378137.0 && p.rpolM === 6356752.31414)

    val cells = GeosProjection.flattenAbi(bytes).toSeq
    // 2×3 grid, x=0.16 column off-disk → 4 cells survive
    assert(cells.size === 4)
    // anchor cell (y=0, x=0): sub-satellite point, raw 8 → 100.08
    val anchor = cells.find(c =>
      math.abs(c._1) < eps && math.abs(c._2 - -75.0) < eps).get
    assert(anchor._3 === 0.01 * 8 + 100.0)
    // fill cell (y=0, x=-0.05): on the equator west of nadir, NaN value
    val fillCell = cells.find(_._3.isNaN).get
    assert(math.abs(fillCell._1) < eps && fillCell._2 < -91.0 && fillCell._2 > -92.0)
    assert(cells.count(_._3.isNaN) === 1)
    // every surviving cell round-trips through the independent forward
    cells.foreach { case (lat, lon, _) =>
      val xy = GeosProjection.forward(lon, lat, GeosProjection.Goes16)
      assert(xy != null && math.abs(xy(0)) < 0.07 && math.abs(xy(1)) < 0.07)
      val ll = GeosProjection.invert(xy(0), xy(1), GeosProjection.Goes16)
      assert(math.abs(ll(0) - lat) < 1e-9 && math.abs(ll(1) - lon) < 1e-9)
    }
  }

  test("geos_to_wgs84 column expression: codegen, off-disk and null inputs") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (0.0, 0.0), (-0.05, -0.06), (0.16, 0.0), (null, 0.0))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        graft.expressions.GeosToWgs84.geos_to_wgs84(col("x"), col("y")).as("ll"))
      .select(col("x"), col("y"), col("ll.lon"), col("ll.lat"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(2) - -75.0) < eps &&
      math.abs(rows(0).getDouble(3)) < eps)
    // equals the file-flatten kernel ({lat, lon} order there)
    val k = GeosProjection.invert(-0.05, -0.06, GeosProjection.Goes16)
    assert(rows(1).getDouble(2) === k(1) && rows(1).getDouble(3) === k(0))
    assert(rows(2).isNullAt(2) && rows(2).isNullAt(3)) // off-disk → null
    assert(rows(3).isNullAt(2) && rows(3).isNullAt(3)) // null propagates
    graft.expressions.GraftExtensions.install(spark)
    val Row(lon: Double, lat: Double) = spark.sql(
      "SELECT geos_to_wgs84(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS ll")
      .select("ll.lon", "ll.lat").head()
    assert(math.abs(lon - -75.0) < eps && math.abs(lat) < eps)
  }

  test("distributed ABI remap: media frame → (source, lat, lon, value) rows") {
    val dir = tmpDir("abi")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a1.nc"), abiFixture)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a2.nc"), abiFixture)
    val media = graft.multimodal.Multimodal.readBinaryFiles(spark, s"$dir/*.nc")
    val df = graft.multimodal.Raster.gridFlattenGoesAbi(media)
    assert(df.count() === 8) // 4 on-disk cells × 2 files
    assert(df.filter(col("value").isNull).count() === 2) // fill → null per file
    assert(df.filter(abs(col("lat")) < eps && abs(col("lon") + 75.0) < eps &&
      col("value") === 100.08).count() === 2)
  }

  // ---- ESRI shapefile reader (boundary polygons → WKT rows) ----

  test("shapefile: synthetic polygon with hole + second outer, points") {
    import graft.multimodal.Shapefile
    val expected =
      "MULTIPOLYGON (((0.0 0.0, 0.0 10.0, 10.0 10.0, 10.0 0.0, 0.0 0.0), " +
        "(2.0 2.0, 4.0 2.0, 4.0 4.0, 2.0 4.0, 2.0 2.0)), " +
        "((20.0 0.0, 20.0 5.0, 25.0 5.0, 25.0 0.0, 20.0 0.0)))"
    val poly = shpFixture(5, polygonRings(Seq(OuterA, HoleOfA, OuterB)))
    val shapes = Shapefile.parse(poly).toSeq
    assert(shapes.map(_.recordNumber) === Seq(1))
    assert(shapes.head.wkt === expected)
    // ring ORDER is not significant per the ESRI spec: the hole arriving
    // AFTER both outers must still attach to the outer containing it
    val reordered = shpFixture(5, polygonRings(Seq(OuterA, OuterB, HoleOfA)))
    assert(Shapefile.parse(reordered).next().wkt === expected)
    // NESTED outers: the hole of the inner island attaches to the
    // INNERMOST containing outer, not the enclosing grandparent
    val bigOuter = Seq((-10.0, -10.0), (-10.0, 30.0), (30.0, 30.0),
      (30.0, -10.0), (-10.0, -10.0)) // CW, contains OuterA entirely
    val nested = shpFixture(5, polygonRings(Seq(bigOuter, OuterA, HoleOfA)))
    assert(Shapefile.parse(nested).next().wkt ===
      "MULTIPOLYGON (((-10.0 -10.0, -10.0 30.0, 30.0 30.0, 30.0 -10.0, -10.0 -10.0)), " +
        "((0.0 0.0, 0.0 10.0, 10.0 10.0, 10.0 0.0, 0.0 0.0), " +
        "(2.0 2.0, 4.0 2.0, 4.0 4.0, 2.0 4.0, 2.0 2.0)))")
    // single-ring polygon renders as plain POLYGON
    val single = shpFixture(5, polygonRings(Seq(OuterA)))
    assert(Shapefile.parse(single).next().wkt ===
      "POLYGON ((0.0 0.0, 0.0 10.0, 10.0 10.0, 10.0 0.0, 0.0 0.0))")
    // point records
    val pts = shpFixture(1, pointContent(3.5, -2.25), pointContent(0.0, 1.0))
    assert(Shapefile.parse(pts).toSeq.map(_.wkt) ===
      Seq("POINT (3.5 -2.25)", "POINT (0.0 1.0)"))
    // truncated input fails with the parser's own diagnostic
    val cut = poly.take(poly.length - 10)
    val err = intercept[IllegalArgumentException](Shapefile.parse(cut).toSeq)
    assert(err.getMessage.contains("truncated"))
    intercept[IllegalArgumentException](Shapefile.parse(Array[Byte](1, 2, 3)))
    // hostile part/point counts in record CONTENT (which header
    // validation can't see) must refuse BEFORE allocating, not OOM
    val hostile = {
      val b = leBuf(4 + 32 + 8 + 4)
      b.putInt(5)
      (1 to 4).foreach(_ => b.putDouble(0.0))
      b.putInt(1).putInt(1 << 28) // claims 4 GiB of points
      b.putInt(0)
      b.array()
    }
    val herr = intercept[IllegalArgumentException](
      Shapefile.parse(shpFixture(5, hostile)).toSeq)
    assert(herr.getMessage.contains("exceed"), herr.getMessage)
  }

  test("shapefile: decodes the reference's real Rio bairro boundaries") {
    import graft.multimodal.Shapefile
    val path = "/root/reference/pipelines/utils/shapefiles/Limite_Bairros_RJ.shp"
    assume(new java.io.File(path).exists())
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val shapes = Shapefile.parse(bytes).toSeq
    assert(shapes.size === 164) // Rio's 164 bairros
    assert(shapes.forall(s => s.wkt.startsWith("POLYGON") ||
      s.wkt.startsWith("MULTIPOLYGON")))
    // every coordinate falls inside the file's own Rio bbox
    val coord = """(-?\d+\.\d+) (-?\d+\.\d+)""".r
    val pairs = coord.findAllMatchIn(shapes.head.wkt).map(m =>
      (m.group(1).toDouble, m.group(2).toDouble)).toSeq
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (lon, lat) =>
      lon > -43.8 && lon < -43.09 && lat > -23.09 && lat < -22.74 })

    // distributed scan: one file → 164 (source, record_id, wkt) rows
    val df = Shapefile.readShp(spark, path)
    assert(df.count() === 164)
    assert(df.select(countDistinct(col("record_id"))).head().getLong(0) === 164)
  }

  /** Minimal .shp writer for fixtures: header + given record contents. */
  private def shpFixture(shapeType: Int, contents: Array[Byte]*): Array[Byte] = {
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos) // big-endian writes
    val totalLen = 100 + contents.map(8 + _.length).sum
    o.writeInt(9994); (1 to 5).foreach(_ => o.writeInt(0))
    o.writeInt(totalLen / 2) // file length in 16-bit words (BE)
    def le(i: Int): Unit = o.writeInt(Integer.reverseBytes(i))
    le(1000); le(shapeType)
    (1 to 8).foreach(_ => o.writeLong(0L)) // bbox + zm ranges (unused)
    contents.zipWithIndex.foreach { case (c, i) =>
      o.writeInt(i + 1); o.writeInt(c.length / 2)
      o.write(c)
    }
    o.flush(); bos.toByteArray
  }

  private def leBuf(n: Int): java.nio.ByteBuffer =
    java.nio.ByteBuffer.allocate(n).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  private def pointContent(x: Double, y: Double): Array[Byte] = {
    val b = leBuf(4 + 16)
    b.putInt(1).putDouble(x).putDouble(y)
    b.array()
  }

  private val OuterA =
    Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
  private val HoleOfA =
    Seq((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))
  private val OuterB =
    Seq((20.0, 0.0), (20.0, 5.0), (25.0, 5.0), (25.0, 0.0), (20.0, 0.0))

  /** Type-5 content from explicit rings (CW outers, CCW holes). */
  private def polygonRings(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val npts = rings.map(_.size).sum
    val b = leBuf(4 + 32 + 8 + 4 * rings.size + 16 * npts)
    b.putInt(5)
    (1 to 4).foreach(_ => b.putDouble(0.0)) // bbox (unused by reader)
    b.putInt(rings.size).putInt(npts)
    rings.scanLeft(0)(_ + _.size).dropRight(1).foreach(b.putInt)
    rings.flatten.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    b.array()
  }

  /** ABI-shaped netCDF classic (CDF-1) fixture, assembled byte-for-byte
    * per the public spec: dims y=2/x=3, int16 scan angles with CF
    * scale/offset, a scalar goes_imager_projection variable carrying the
    * projection attrs, and an int16 CMI(y,x) grid with a _FillValue
    * hole. Two passes: zero begins to measure the header, then real
    * offsets. */
  private def abiFixture: Array[Byte] = {
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    // raw int16 scan angles, scale 1e-4: y = [-0.06, 0], x = [-0.05, 0, 0.16]
    val rawY = Array[Short](-600, 0)
    val rawX = Array[Short](-500, 0, 1600)
    // CMI raw shorts, scale 0.01 offset 100, fill -1 at (y=0, x=-0.05)
    val rawCmi = Array[Short](0, 2, 4, -1, 8, 10)

    def header(beginY: Int, beginX: Int, beginProj: Int, beginCmi: Int): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val o = new DataOutputStream(bos)
      def name(s: String): Unit = {
        o.writeInt(s.length); o.writeBytes(s)
        (0 until (4 - s.length % 4) % 4).foreach(_ => o.writeByte(0))
      }
      def dAtt(n: String, v: Double): Unit = {
        name(n); o.writeInt(6); o.writeInt(1); o.writeDouble(v)
      }
      o.writeBytes("CDF"); o.writeByte(1)  // magic, CDF-1
      o.writeInt(0)                        // numrecs
      o.writeInt(0x0A); o.writeInt(2)      // NC_DIMENSION ×2
      name("y"); o.writeInt(2)
      name("x"); o.writeInt(3)
      o.writeInt(0); o.writeInt(0)         // global atts ABSENT
      o.writeInt(0x0B); o.writeInt(4)      // NC_VARIABLE ×4
      name("y"); o.writeInt(1); o.writeInt(0)
      o.writeInt(0x0C); o.writeInt(2)      // y atts
      dAtt("scale_factor", 1e-4); dAtt("add_offset", 0.0)
      o.writeInt(3); o.writeInt(4); o.writeInt(beginY)  // NC_SHORT, vsize 4
      name("x"); o.writeInt(1); o.writeInt(1)
      o.writeInt(0x0C); o.writeInt(2)      // x atts
      dAtt("scale_factor", 1e-4); dAtt("add_offset", 0.0)
      o.writeInt(3); o.writeInt(8); o.writeInt(beginX)  // NC_SHORT, vsize 6→8
      name("goes_imager_projection"); o.writeInt(0)     // scalar
      o.writeInt(0x0C); o.writeInt(5)      // projection atts
      dAtt("longitude_of_projection_origin", -75.0)
      dAtt("perspective_point_height", 35786023.0)
      dAtt("semi_major_axis", 6378137.0)
      dAtt("semi_minor_axis", 6356752.31414)
      name("sweep_angle_axis"); o.writeInt(2); o.writeInt(1) // NC_CHAR "x"
      o.writeByte('x'); o.writeByte(0); o.writeByte(0); o.writeByte(0)
      o.writeInt(4); o.writeInt(4); o.writeInt(beginProj) // NC_INT scalar
      name("CMI"); o.writeInt(2); o.writeInt(0); o.writeInt(1) // dims (y, x)
      o.writeInt(0x0C); o.writeInt(3)      // CMI atts
      dAtt("scale_factor", 0.01); dAtt("add_offset", 100.0)
      name("_FillValue"); o.writeInt(3); o.writeInt(1)
      o.writeShort(-1); o.writeShort(0)    // short fill + pad
      o.writeInt(3); o.writeInt(12); o.writeInt(beginCmi) // NC_SHORT 6 vals
      o.flush(); bos.toByteArray
    }
    val h = header(0, 0, 0, 0).length
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.write(header(h, h + 4, h + 12, h + 16))
    rawY.foreach(v => o.writeShort(v))
    rawX.foreach(v => o.writeShort(v)); o.writeShort(0) // pad 6→8
    o.writeInt(-2147483647)                             // proj scalar payload
    rawCmi.foreach(v => o.writeShort(v))
    o.flush(); bos.toByteArray
  }
}
