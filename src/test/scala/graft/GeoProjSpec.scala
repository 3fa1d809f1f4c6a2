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
  }

  test("northern-hemisphere variant: FN=0 at the equator") {
    val r = UtmToWgs84.invert(500000.0, 0.0,
      UtmToWgs84.Grs80A, UtmToWgs84.Grs80InvF, UtmToWgs84.UtmK0,
      500000.0, 0.0, -45.0)
    assert(math.abs(r(1)) < eps)
  }
}
