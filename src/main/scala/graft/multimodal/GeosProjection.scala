package graft.multimodal

/** GOES-R ABI fixed-grid → geographic remap (SURVEY §2.1 S18 second
  * half).
  *
  * Real ABI L1b/L2 netCDF files do NOT carry lat/lon coordinate
  * variables: they store x/y GOES fixed-grid *scan angles* (radians,
  * int16 + CF scale/offset) plus a `goes_imager_projection` variable
  * whose attributes define a geostationary perspective projection. The
  * reference remaps that grid to lat/lon before flattening
  * (satelite/satellite_utils.py:452-478, `remap_g16`, via
  * pyproj/GDAL). Here the remap is the closed-form geostationary
  * inverse from the public GOES-R Product User Guide (vol. 3,
  * §5.1.2.8.1) — a per-cell kernel that runs inside the scan
  * partitions, no raster lib.
  *
  * Off-disk cells (scan angles whose ray misses the ellipsoid —
  * negative discriminant) have no geographic position and are dropped,
  * matching what the reference's remap masks out.
  */
object GeosProjection {

  /** Projection constants from `goes_imager_projection`:
    * `hM` = perspective_point_height (above the ellipsoid surface, m),
    * `reqM`/`rpolM` = semi-major/minor axes (m), `lon0Deg` =
    * longitude_of_projection_origin. GOES-R uses sweep axis "x"; the
    * EUMETSAT convention ("y") swaps the scan-angle roles. */
  final case class Params(lon0Deg: Double, hM: Double,
                          reqM: Double, rpolM: Double, sweepX: Boolean) {
    /** Distance satellite ↔ earth center. */
    def hFromCenter: Double = hM + reqM
  }

  /** GOES-16 defaults (PUG table 5.1.2.8-1). */
  val Goes16: Params =
    Params(-75.0, 35786023.0, 6378137.0, 6356752.31414, sweepX = true)

  /** Read projection params from a parsed netCDF header's
    * `goes_imager_projection` (or compatible grid_mapping) variable. */
  def fromNc(nc: NetCdf.NcFile,
             projVar: String = "goes_imager_projection"): Params = {
    val v = nc.variable(projVar)
    def need(att: String): Double = NetCdf.attNum(v, att).getOrElse(
      throw new IllegalArgumentException(s"$projVar missing attr $att"))
    val sweep = NetCdf.attText(v, "sweep_angle_axis").getOrElse("x").trim
    Params(need("longitude_of_projection_origin"),
      need("perspective_point_height"),
      need("semi_major_axis"), need("semi_minor_axis"),
      sweepX = sweep == "x")
  }

  /** Inverse: fixed-grid scan angles (radians) → {latDeg, lonDeg}, or
    * null when the cell is off the earth disk. PUG vol.3 §5.1.2.8.1.
    * Kernel shared with the column-level expression
    * ([[graft.expressions.GeosToWgs84]], which returns {lon, lat}). */
  def invert(x: Double, y: Double, p: Params): Array[Double] = {
    // Sweep-y instruments define the first rotation about the other
    // axis; the geometry is the same with the angle roles swapped.
    val (xa, ya) = if (p.sweepX) (x, y) else (y, x)
    val r = graft.expressions.GeosToWgs84.invert(
      xa, ya, p.lon0Deg, p.hM, p.reqM, p.rpolM)
    if (r == null) null else Array(r(1), r(0))
  }

  /** Forward: geographic (degrees) → fixed-grid scan angles (radians),
    * or null when the point is not visible from the satellite. PUG
    * vol.3 §5.1.2.8.2. Used for round-trip specs and for projecting
    * query geometry INTO the grid (e.g. bbox → scan-angle window). */
  def forward(lonDeg: Double, latDeg: Double, p: Params): Array[Double] = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg) - math.toRadians(p.lon0Deg)
    val h = p.hFromCenter
    val req2 = p.reqM * p.reqM
    val rpol2 = p.rpolM * p.rpolM
    val phiC = math.atan(rpol2 / req2 * math.tan(phi))
    val e2 = (req2 - rpol2) / req2
    val cosPc = math.cos(phiC)
    val rc = p.rpolM / math.sqrt(1.0 - e2 * cosPc * cosPc)
    val sx = h - rc * cosPc * math.cos(lam)
    val sy = -rc * cosPc * math.sin(lam)
    val sz = rc * math.sin(phiC)
    // visibility: the point must be on the satellite-facing hemisphere
    if (h * (h - sx) < sy * sy + rr(p) * sz * sz) return null
    val xa = math.asin(-sy / math.sqrt(sx * sx + sy * sy + sz * sz))
    val ya = math.atan(sz / sx)
    if (p.sweepX) Array(xa, ya) else Array(ya, xa)
  }

  private def rr(p: Params): Double = (p.reqM * p.reqM) / (p.rpolM * p.rpolM)

  /** Executor-local flatten of one ABI-shaped netCDF file: x/y scan
    * angles + 2D data grid + projection attrs → (lat, lon, value)
    * tuples, off-disk cells dropped, fill values surfaced as NaN (the
    * downstream quality filter decides, as with [[NetCdf.flattenGrid]]).
    * Handles (y,x) — the ABI layout — or (x,y) data dim order. */
  def flattenAbi(bytes: Array[Byte], xVar: String = "x", yVar: String = "y",
                 dataVar: String = "CMI",
                 projVar: String = "goes_imager_projection"
                ): Iterator[(Double, Double, Double)] = {
    val nc = NetCdf.parseHeader(bytes)
    val p = fromNc(nc, projVar)
    val xs = NetCdf.readNumeric(bytes, nc, xVar)
    val ys = NetCdf.readNumeric(bytes, nc, yVar)
    val data = NetCdf.readNumeric(bytes, nc, dataVar)
    val v = nc.variable(dataVar)
    val xDim = nc.variable(xVar).dimIds.head
    val yDim = nc.variable(yVar).dimIds.head
    val yFirst = v.dimIds == Seq(yDim, xDim)
    require(yFirst || v.dimIds == Seq(xDim, yDim),
      s"'$dataVar' dims ${v.dimIds} are not the ($yVar, $xVar) grid")
    for {
      i <- Iterator.range(0, ys.length)
      j <- Iterator.range(0, xs.length)
      ll = invert(xs(j), ys(i), p)
      if ll != null
    } yield {
      val cell = if (yFirst) data(i * xs.length + j) else data(j * ys.length + i)
      (ll(0), ll(1), cell)
    }
  }
}
