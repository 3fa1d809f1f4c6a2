package graft

import java.sql.Timestamp

import graft.connectors.{RateLimited, Scrape}
import graft.expressions.GraftExtensions
import graft.streaming.EntityWatermark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("html table scrape: header promotion + decimal comma (S17)") {
    val html =
      """<html><body><table>
        |<tr><th>Estação</th><th>Chuva 15min</th></tr>
        |<tr><td>Tijuca</td><td>1,8</td></tr>
        |<tr><td>Urca</td><td>ND</td></tr>
        |</table></body></html>""".stripMargin
    val df = Scrape.readHtmlTable(spark, html)
    assert(df.columns.toSeq === Seq("estacao", "chuva_15min"))
    val vals = df.select($"estacao", Scrape.scrapedNumber($"chuva_15min"))
      .as[(String, Option[Double])].collect().toMap
    assert(vals === Map("Tijuca" -> Some(1.8), "Urca" -> None))
  }

  test("rate-limited map paces calls (U8)") {
    val t0 = System.nanoTime()
    val out = RateLimited.mapRateLimited(
      spark.range(5).as[Long], perPartitionRps = 50)(identity)
      .collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    // 5 calls at 50 rps → ≥ 80 ms of pacing (4 intervals × 20 ms)
    assert(elapsedMs >= 80, s"elapsed $elapsedMs ms — pacing not applied")
  }

  test("unaccent registered for SQL via extensions (§7.9)") {
    GraftExtensions.install(spark)
    val out = spark.sql("SELECT unaccent('Cüstómér ação') AS s")
      .as[String].head()
    assert(out === "Customer acao")
    // the whole native surface is SQL-addressable
    assert(spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0) === 11.0)
    assert(spark.sql("SELECT shingles('a b c d', 3)")
      .head().getSeq[String](0) === Seq("a b c", "b c d"))
    assert(spark.sql("SELECT hex_prefix_to_long('09f0ffffffffffff', 4)")
      .head().getLong(0) === 0x09f0L)
    val hll = spark.sql(
      """SELECT hll_estimate(hll_merge(sk)) FROM
        |  (SELECT hll_sketch(id) AS sk FROM range(5000) GROUP BY id % 4)
        |""".stripMargin).head().getLong(0)
    assert(math.abs(hll - 5000) < 250)
    // BPE surface (default committed vocabulary)
    assert(spark.sql("SELECT bpe_count('batch join')").head().getLong(0) ===
      spark.sql("SELECT size(bpe_tokens('batch join'))").head().getInt(0).toLong)
    // round-9 kernels
    assert(spark.sql(
        "SELECT substr_mask('a b c d e', array(1), 2).clean_text")
      .as[String].head() === "a d e")
    assert(spark.sql("SELECT chunk_texts('a b c d e', 2, 1)")
      .head().getSeq[String](0) === Seq("a b", "b c", "c d", "d e"))
    assert(spark.sql("SELECT top_ngram_frac('x y x y x', 2)")
      .head().getDouble(0) === 0.5)
    // input contract: a SORTED array (the bucket path sorts upstream)
    assert(spark.sql("SELECT sorted_pairs(array(1L, 2L, 3L))")
      .head().getSeq[org.apache.spark.sql.Row](0).map(r =>
        (r.getLong(0), r.getLong(1))) === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // band_keys agrees with the Column API (same native kernel)
    val sqlKeys = spark.sql("SELECT band_keys('a b c d e f')")
      .head().getSeq[String](0)
    val colKeys = Seq(Tuple1("a b c d e f")).toDF("text")
      .select(graft.functions.DedupOps.bandKeysPerRow($"text"))
      .head().getSeq[String](0)
    assert(sqlKeys === colKeys && sqlKeys.size === 4)
    val ts = spark.sql("SELECT text_stats('the cat and the hat!')").head()
      .getStruct(0)
    assert(ts.getLong(1) === 5L, ts.toString) // n_tok
    assert(ts.getLong(2) === 3L, ts.toString) // stop hits: the, and, the
    // SQL builders CAST: bigint starts (q113's natural shape) parse
    // correctly instead of being misread through getInt
    assert(spark.sql(
        "SELECT substr_mask('a b c d e', array(1L), 2).clean_text")
      .as[String].head() === "a d e")
    // plan-time args CONSTANT-FOLD like builtins: any foldable
    // expression is accepted, not just a bare literal — 1+2, a typed
    // long within Int range, upper('x') stopwords
    assert(spark.sql("SELECT shingles('a b c d', 1 + 2)")
      .head().getSeq[String](0) === Seq("a b c", "b c d"))
    assert(spark.sql("SELECT hex_prefix_to_long('09f0ffffffffffff', 4L)")
      .head().getLong(0) === 0x09f0L)
    val tsF = spark.sql(
      "SELECT text_stats('the cat and the hat!', lower('THE'), 'and')").head()
      .getStruct(0)
    assert(tsF.getLong(2) === 3L, tsF.toString) // folded stopwords applied
    // a NON-constant arg still fails loudly at plan time
    val err = intercept[Exception] {
      spark.sql("SELECT shingles(text, n) FROM VALUES ('a b', 2) AS t(text, n)")
        .collect()
    }
    assert(err.getMessage.contains("foldable") ||
      err.getMessage.toLowerCase.contains("constant"), err.getMessage)
    // null text: the Column API keeps its documented empty-array
    // contract; the raw SQL function is null-in → null-out
    assert(Seq(Tuple1(null: String)).toDF("text")
      .select(graft.functions.DedupOps.bandKeysPerRow($"text").as("k"))
      .head().getSeq[String](0) === Seq())
    assert(spark.sql("SELECT band_keys(CAST(NULL AS STRING))")
      .head().isNullAt(0))
  }

  // Assemble a netCDF classic (CDF-1) file byte-for-byte per the public
  // spec: dims lat=3/lon=4, float coord vars, a short Band1 grid packed
  // with scale_factor/add_offset and a _FillValue hole. Two passes: first
  // with zero begins to measure the header, then with real offsets.
  private def cdf1Fixture: Array[Byte] = {
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    val lats = Array(10f, 20f, 30f)
    val lons = Array(1f, 2f, 3f, 4f)
    // raw shorts; -1 is the fill; unpacked = raw*0.5 + 10
    val raw = Array[Short](0, 2, 4, 6, 8, 10, -1, 14, 16, 18, 20, 22)

    def header(beginLat: Int, beginLon: Int, beginBand: Int): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val o = new DataOutputStream(bos)
      def name(s: String): Unit = {
        o.writeInt(s.length); o.writeBytes(s)
        (0 until (4 - s.length % 4) % 4).foreach(_ => o.writeByte(0))
      }
      o.writeBytes("CDF"); o.writeByte(1) // magic, version 1
      o.writeInt(0)                       // numrecs
      o.writeInt(0x0A); o.writeInt(2)     // NC_DIMENSION ×2
      name("lat"); o.writeInt(3)
      name("lon"); o.writeInt(4)
      o.writeInt(0); o.writeInt(0)        // global atts ABSENT
      o.writeInt(0x0B); o.writeInt(3)     // NC_VARIABLE ×3
      name("lat"); o.writeInt(1); o.writeInt(0)
      o.writeInt(0); o.writeInt(0)        // no atts
      o.writeInt(5); o.writeInt(12); o.writeInt(beginLat) // NC_FLOAT
      name("lon"); o.writeInt(1); o.writeInt(1)
      o.writeInt(0); o.writeInt(0)
      o.writeInt(5); o.writeInt(16); o.writeInt(beginLon)
      name("Band1"); o.writeInt(2); o.writeInt(0); o.writeInt(1)
      o.writeInt(0x0C); o.writeInt(3)     // NC_ATTRIBUTE ×3
      name("scale_factor"); o.writeInt(6); o.writeInt(1); o.writeDouble(0.5)
      name("add_offset"); o.writeInt(6); o.writeInt(1); o.writeDouble(10.0)
      name("_FillValue"); o.writeInt(3); o.writeInt(1)
      o.writeShort(-1); o.writeShort(0)   // short value + pad to 4
      o.writeInt(3); o.writeInt(24); o.writeInt(beginBand) // NC_SHORT
      o.flush(); bos.toByteArray
    }
    val hlen = header(0, 0, 0).length
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.write(header(hlen, hlen + 12, hlen + 28))
    lats.foreach(o.writeFloat)
    lons.foreach(o.writeFloat)
    raw.foreach(v => o.writeShort(v))
    o.flush(); bos.toByteArray
  }

  test("radar PPI: az slotting, median/gap-fill, CMAX/CAVG/CAPPI, geo (S19)") {
    import graft.multimodal.RadarPpi
    val gain = 0.5
    val off = -32.0
    def ray(el: Double, az: Double, bins: Seq[Double]) =
      ("v1", el, az, az, gain, off, bins)

    // el 0.5°: slots 0,1,3,4,6,7 single rays; slot 2 MISSING; slot 5 has
    // three rays (one all-zero → dropped, median of the other two).
    // el 2.5°: all 8 slots present. nRays = 8 → 45° slots.
    val el05 = Seq(0, 1, 3, 4, 6, 7).map(s =>
      ray(0.5, s * 45.0 + 10, Seq.tabulate(4)(j => 10.0 * s + j))) ++ Seq(
      ray(0.5, 235.0, Seq(2, 4, 6, 8)), ray(0.5, 230.0, Seq(4, 6, 8, 10)),
      ray(0.5, 232.0, Seq(0, 0, 0, 0)))
    val el25 = (0 until 8).map(s =>
      ray(2.5, s * 45.0 + 10, Seq.tabulate(4)(_ => 100.0 + s)))
    val rays = (el05 ++ el25).toDF("source", "elangle", "start_az", "stop_az",
      "gain", "offset", "bins")

    // wraparound slotting: start 350 stop 20 → mean 5° → slot 0
    val wrap = Seq(("w", 0.5, 350.0, 20.0, 1.0, 0.0, Seq(1.0)))
      .toDF("source", "elangle", "start_az", "stop_az", "gain", "offset", "bins")
    assert(RadarPpi.slotValues(wrap, nRays = 8).select($"slot").head().getInt(0) === 0)

    // rays sharing a slot with DIFFERENT calibration: the affine applies
    // per ray before the median, so median(1*10+0, 10*2+5) = 17.5 —
    // never median-of-raw times whichever ray's gain `first` picked
    val mixed = Seq(
      ("m", 0.5, 10.0, 10.0, 1.0, 0.0, Seq(10.0)),
      ("m", 0.5, 12.0, 12.0, 10.0, 5.0, Seq(2.0))
    ).toDF("source", "elangle", "start_az", "stop_az", "gain", "offset", "bins")
    assert(RadarPpi.slotValues(mixed, nRays = 8).select($"value").head()
      .getDouble(0) === 17.5)

    val vox = RadarPpi.voxels(rays, nRays = 8).cache()
    assert(vox.count() === 2 * 8 * 4) // both elevations fully gap-filled

    def v(el: Double, slot: Int, bin: Int): Double =
      vox.filter($"elangle" === el && $"slot" === slot && $"bin_idx" === bin)
        .head().getAs[Double]("value")
    // plain slot: value = gain*raw + offset
    assert(v(0.5, 0, 2) === gain * 2 + off)
    // repeated slot 5: all-zero ray dropped, median of (2+2j, 4+2j) = 3+2j
    assert(v(0.5, 5, 0) === gain * 3 + off)
    assert(v(0.5, 5, 3) === gain * 9 + off)
    // missing slot 2: midpoint of slot 1 (raw 10+j) and slot 3 (raw 30+j)
    assert(v(0.5, 2, 1) === gain * 21 + off)

    // CMAX: el 2.5 (raw 100+s) always dominates
    val cm = RadarPpi.cmax(vox)
    assert(cm.count() === 8 * 4)
    assert(cm.filter($"slot" === 3 && $"bin_idx" === 0).head()
      .getAs[Double]("value") === gain * 103 + off)
    // CAVG at slot 0, bin 0: mean of el05 (raw 0) and el25 (raw 100)
    assert(RadarPpi.cavg(vox).filter($"slot" === 0 && $"bin_idx" === 0).head()
      .getAs[Double]("value") === (gain * 0 + off + gain * 100 + off) / 2)

    // CAPPI at 0.05 km, rscale 1 km: near range the 2.5° beam is closer
    // to target, far range the 0.5° beam is — elevation choice flips
    val cp = RadarPpi.cappi(vox, targetKm = 0.05, rscaleM = 1000.0)
    assert(cp.filter($"slot" === 0 && $"bin_idx" === 0).head()
      .getAs[Double]("value") === gain * 100 + off) // el 2.5 wins at 0.5 km
    assert(cp.filter($"slot" === 0 && $"bin_idx" === 3).head()
      .getAs[Double]("value") === gain * 3 + off)   // el 0.5 wins at 3.5 km

    // geo: slot 0 = due north (lat moves, lon fixed), slot 2 = due east
    def geoOf(slot: Int) = RadarPpi.toGeo(
      cm.filter($"slot" === slot && $"bin_idx" === 3),
      siteLat = -22.96, siteLon = -43.26, rscaleM = 1000.0, nRays = 8).head()
    val north = geoOf(0)
    assert(north.getAs[Double]("lat") > -22.93 &&
      math.abs(north.getAs[Double]("lon") + 43.26) < 1e-9)
    val east = geoOf(2)
    assert(east.getAs[Double]("lon") > -43.23 &&
      math.abs(east.getAs[Double]("lat") + 22.96) < 1e-9)
    vox.unpersist()
  }

  test("radar gap-fill is total: any present-subset yields a full, null-free grid") {
    import graft.multimodal.RadarPpi
    // 12 random-ish presence patterns, including the 1-present-slot and
    // the seam-wrapping cases; every fill must produce nRays×bins rows
    // per elevation with no nulls and all values inside [min, max] of
    // the present values (linear interpolation cannot overshoot)
    val patterns = Seq(
      Seq(0), Seq(7), Seq(0, 7), Seq(1, 2, 3), Seq(5, 6, 7), Seq(0, 4),
      Seq(2, 5), Seq(0, 1, 6, 7), Seq(3), Seq(1, 4, 6), (0 to 7), Seq(2, 3, 4))
    patterns.zipWithIndex.foreach { case (present, pi) =>
      val rays = present.map(s =>
        (s"p$pi", 0.5, s * 45.0 + 5, s * 45.0 + 5, 1.0, 0.0,
          Seq(10.0 + s, 20.0 + s)))
        .toDF("source", "elangle", "start_az", "stop_az", "gain", "offset", "bins")
      val vox = RadarPpi.voxels(rays, nRays = 8)
      assert(vox.count() === 8 * 2, s"pattern $present")
      assert(vox.filter($"value".isNull).count() === 0, s"pattern $present")
      val b = vox.agg(min($"value"), max($"value")).head()
      val lo = 10.0 + present.min
      val hi = 20.0 + present.max
      assert(b.getDouble(0) >= lo && b.getDouble(1) <= hi, s"pattern $present")
    }
  }

  test("hdf5 subset reader: groups, attrs, contiguous + chunked/deflate (S19 real)") {
    import graft.multimodal.Hdf5
    val f = Hdf5.open(Hdf5Fixture.odimVolume())

    // group traversal + string/double/long/array attributes
    assert(f.resolve("/what").attrs("source").text === Some("RAD:TEST1"))
    assert(f.resolve("/where").attrs("lat").num === -22.96)
    assert(f.resolve("/dataset1/where").attrs("elangle").num === 0.5)
    assert(f.resolve("/dataset1/where").attrs("nbins").num === 3.0)
    assert(f.resolve("/dataset1/how").attrs("startazA").nums.toSeq ===
      Seq(350.0, 80.0, 170.0, 260.0))
    assert(f.resolve("/dataset1/data1/what").attrs("quantity").text === Some("DBZH"))

    // chunked + deflate u16, partial edge chunks (4×3 data, 2×2 chunks)
    val d1 = f.resolve("/dataset1/data1/data")
    assert(d1.dims === Seq(4, 3) && d1.deflate)
    assert(f.readData(d1).toSeq === Seq(
      10, 11, 12, 20, 21, 999, 30, 31, 32, 40, 41, 42).map(_.toDouble))

    // contiguous float64
    val d2 = f.resolve("/dataset2/data1/data")
    assert(d2.dims === Seq(4, 3) && !d2.deflate)
    assert(f.readData(d2).toSeq === Seq(
      100.0, 101.0, 102.0, 110.0, 111.0, 112.0,
      120.0, 121.0, 122.0, 130.0, 131.0, 132.0))

    // unsupported features fail loudly, not silently
    val bad = Hdf5Fixture.odimVolume(); bad(8) = 2 // superblock version 2
    val e = intercept[IllegalArgumentException](Hdf5.open(bad))
    assert(e.getMessage.contains("superblock version"))
  }

  test("odim volume → rays → PPI composites end-to-end (S19/U6)") {
    import graft.multimodal.{Multimodal, OdimH5, RadarPpi}
    val bytes = Hdf5Fixture.odimVolume()

    // meta for the geo steps
    val m = OdimH5.meta(bytes)
    assert(m.source === "RAD:TEST1" && m.lat === -22.96)
    assert(m.scans.map(s => (s.dataset, s.elangle, s.rscaleM)) ===
      Seq(("dataset1", 0.5, 1000.0), ("dataset2", 1.5, 1000.0)))

    // executor-local decode: 2 elevations × 4 rays
    val rays = OdimH5.rays(bytes, "fallback").toSeq
    assert(rays.size === 8)
    val r1 = rays(1) // dataset1 ray 1: explicit azimuths, nodata bin
    assert(r1.getString(0) === "RAD:TEST1" && r1.getDouble(1) === 0.5)
    assert(r1.getDouble(2) === 80.0 && r1.getDouble(3) === 100.0)
    assert(r1.getDouble(4) === 0.5 && r1.getDouble(5) === -32.0)
    assert(r1.getSeq[Any](6) === Seq(20.0, 21.0, null)) // 999 → nodata → null
    val r4 = rays(4) // dataset2 ray 0: uniform azimuths
    assert(r4.getDouble(1) === 1.5 && r4.getDouble(2) === 0.0 && r4.getDouble(3) === 90.0)

    // distributed: media frame → ray frame → voxels → CMAX
    val media = Multimodal.asMedia(
      Seq((1L, bytes, "vol1.h5")).toDF("id", "bytes", "src"),
      "id", "bytes", "hdf5", "src")
    val rayDf = OdimH5.raysFrame(media)
    assert(rayDf.count() === 8)
    val vox = RadarPpi.voxels(rayDf, nRays = 4).cache()
    assert(vox.count() === 2 * 4 * 3) // full grid, both elevations
    def v(el: Double, slot: Int, bin: Int): Double =
      vox.filter($"elangle" === el && $"slot" === slot && $"bin_idx" === bin)
        .head().getAs[Double]("value")
    // el 0.5: wraparound ray (350→20) lands slot 0; physical = 0.5*raw - 32
    assert(v(0.5, 0, 0) === 0.5 * 10 - 32)
    // nodata bin: slot 1 bin 2 is null after slotValues, gap-filled from
    // circular neighbors slot 0 (0.5*12-32) and slot 2 (0.5*32-32)
    assert(v(0.5, 1, 2) === ((0.5 * 12 - 32) + (0.5 * 32 - 32)) / 2)
    // el 1.5 contiguous path: gain 1, offset 0
    assert(v(1.5, 2, 1) === 121.0)
    // CMAX: el 1.5 dominates everywhere
    assert(RadarPpi.cmax(vox).filter($"slot" === 0 && $"bin_idx" === 0)
      .head().getAs[Double]("value") === 100.0)
    vox.unpersist()
  }

  test("netCDF classic decode: header, CF unpack, grid flatten (S18 real)") {
    import graft.multimodal.NetCdf
    val bytes = cdf1Fixture
    val nc = NetCdf.parseHeader(bytes)
    assert(nc.dims.map(d => (d.name, d.length)) === Seq(("lat", 3), ("lon", 4)))
    assert(nc.vars.map(_.name) === Seq("lat", "lon", "Band1"))
    assert(NetCdf.readNumeric(bytes, nc, "lat").toSeq === Seq(10.0, 20.0, 30.0))
    assert(NetCdf.readNumeric(bytes, nc, "lon").toSeq === Seq(1.0, 2.0, 3.0, 4.0))

    val cells = NetCdf.flattenGrid(bytes, "lat", "lon", "Band1").toSeq
    assert(cells.size === 12)
    // raw 0 → 0*0.5+10 = 10; raw 22 → 21; fill (-1) → NaN
    assert(cells.head === ((10.0, 1.0, 10.0)))
    assert(cells.last === ((30.0, 4.0, 21.0)))
    assert(cells(6)._3.isNaN) // the -1 fill hole at (row 1, col 2)
    // full expected grid, row-major
    val expected = Seq(10.0, 11.0, 12.0, 13.0, 14.0, 15.0, Double.NaN, 17.0,
      18.0, 19.0, 20.0, 21.0)
    cells.map(_._3).zip(expected).foreach { case (a, e) =>
      assert(a.isNaN === e.isNaN); if (!e.isNaN) assert(a === e)
    }

    // distributed path: media frame → (source, lat, lon, value) rows
    val dir = tmpDir("nc")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/g1.nc"), bytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/g2.nc"), bytes)
    val media = graft.multimodal.Multimodal.readBinaryFiles(spark, s"$dir/*.nc")
    val df = graft.multimodal.Raster.gridFlattenNetCdf(media)
    assert(df.count() === 24)
    assert(df.filter($"value".isNull).count() === 2) // fill → null per file
    assert(df.filter($"lat" === 30.0 && $"lon" === 4.0 && $"value" === 21.0)
      .count() === 2)
  }

  test("netCDF CDF-2: 64-bit offsets + interleaved record variables") {
    import graft.multimodal.NetCdf
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    // dims: time (record), x=2. Vars: x(float, fixed), a(short, time×x),
    // b(int, time). Record block stride = vsize(a)+vsize(b) = 8, records
    // interleaved [a_r | b_r] — the branch the CDF-1 fixture never hits.
    def name(o: DataOutputStream, s: String): Unit = {
      o.writeInt(s.length); o.writeBytes(s)
      (0 until (4 - s.length % 4) % 4).foreach(_ => o.writeByte(0))
    }
    def header(beginX: Long, beginA: Long, beginB: Long): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val o = new DataOutputStream(bos)
      o.writeBytes("CDF"); o.writeByte(2)  // CDF-2: 64-bit begins
      o.writeInt(3)                        // numrecs
      o.writeInt(0x0A); o.writeInt(2)
      name(o, "time"); o.writeInt(0)       // record dim
      name(o, "x"); o.writeInt(2)
      o.writeInt(0); o.writeInt(0)         // no global atts
      o.writeInt(0x0B); o.writeInt(3)
      name(o, "x"); o.writeInt(1); o.writeInt(1)
      o.writeInt(0); o.writeInt(0)
      o.writeInt(5); o.writeInt(8); o.writeLong(beginX)   // NC_FLOAT
      name(o, "a"); o.writeInt(2); o.writeInt(0); o.writeInt(1)
      o.writeInt(0); o.writeInt(0)
      o.writeInt(3); o.writeInt(4); o.writeLong(beginA)   // NC_SHORT rec
      name(o, "b"); o.writeInt(1); o.writeInt(0)
      o.writeInt(0); o.writeInt(0)
      o.writeInt(4); o.writeInt(4); o.writeLong(beginB)   // NC_INT rec
      o.flush(); bos.toByteArray
    }
    val h = header(0, 0, 0).length
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.write(header(h, h + 8, h + 12))
    Seq(7.5f, 8.5f).foreach(o.writeFloat)          // x
    // records: [a0 b0][a1 b1][a2 b2]
    o.writeShort(1); o.writeShort(2); o.writeInt(10)
    o.writeShort(3); o.writeShort(4); o.writeInt(20)
    o.writeShort(5); o.writeShort(6); o.writeInt(30)
    o.flush()
    val bytes = bos.toByteArray

    val nc = NetCdf.parseHeader(bytes)
    assert(nc.version === 2 && nc.numRecs === 3)
    assert(nc.shape(nc.variable("a")) === Seq(3, 2))
    assert(NetCdf.readNumeric(bytes, nc, "x").toSeq === Seq(7.5, 8.5))
    assert(NetCdf.readNumeric(bytes, nc, "a").toSeq ===
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    assert(NetCdf.readNumeric(bytes, nc, "b").toSeq === Seq(10.0, 20.0, 30.0))
  }

  test("netCDF single record variable: unpadded stride (spec exception)") {
    import graft.multimodal.NetCdf
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    // ONE record var of 1 short/record: the spec says record data is NOT
    // padded in this case — stride is 2 bytes, not the padded vsize 4.
    def name(o: DataOutputStream, s: String): Unit = {
      o.writeInt(s.length); o.writeBytes(s)
      (0 until (4 - s.length % 4) % 4).foreach(_ => o.writeByte(0))
    }
    def header(beginC: Long): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val o = new DataOutputStream(bos)
      o.writeBytes("CDF"); o.writeByte(2)
      o.writeInt(3)
      o.writeInt(0x0A); o.writeInt(1)
      name(o, "time"); o.writeInt(0)
      o.writeInt(0); o.writeInt(0)
      o.writeInt(0x0B); o.writeInt(1)
      name(o, "c"); o.writeInt(1); o.writeInt(0)
      o.writeInt(0); o.writeInt(0)
      o.writeInt(3); o.writeInt(4); o.writeLong(beginC)
      o.flush(); bos.toByteArray
    }
    val h = header(0).length
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.write(header(h))
    Seq(1, 2, 3).foreach(v => o.writeShort(v))  // packed, 2-byte stride
    o.flush()
    val bytes = bos.toByteArray
    val nc = NetCdf.parseHeader(bytes)
    assert(NetCdf.readNumeric(bytes, nc, "c").toSeq === Seq(1.0, 2.0, 3.0))
  }

  test("hex_prefix_to_long matches DuckDB CAST('0x'||substr(md5,1,15)) (codegen + interp)") {
    import graft.expressions.HexPrefixToLong.hex_prefix_to_long
    // DuckDB ground truth: CAST('0x'||substr(md5('abc'),1,15) AS BIGINT)
    val expect = 648541476951500027L
    val viaCodegen = spark.range(1)
      .select(hex_prefix_to_long(md5(lit("abc").cast("binary")), 15).as("v"))
      .head().getLong(0)
    assert(viaCodegen === expect)
    // interpreted path agrees with generated code
    assert(graft.expressions.HexPrefixToLong.parse(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        java.security.MessageDigest.getInstance("MD5")
          .digest("abc".getBytes).map("%02x".format(_)).mkString), 15) === expect)
    // and with Spark's own conv()
    val viaConv = spark.range(1)
      .select(conv(substring(md5(lit("abc").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("v")).head().getLong(0)
    assert(viaConv === expect)
  }

  test("optimizer rule collapses nested unaccent (§4 custom rule)") {
    val s2 = spark.newSession()
    graft.expressions.GraftExtensions.install(s2)
    s2.experimental.extraOptimizations =
      Seq(graft.expressions.CollapseUnaccent)
    import graft.expressions.Unaccent.unaccent
    val df = s2.range(1).select(
      unaccent(unaccent(concat(lit("Cü"), $"id".cast("string")))).as("s"))
    val optimized = df.queryExecution.optimizedPlan.toString
    // exactly one unaccent survives optimization
    assert("unaccent".r.findAllMatchIn(optimized.toLowerCase).size === 1,
      optimized)
    assert(df.as[String](org.apache.spark.sql.Encoders.STRING).head() === "Cu0")
  }

  test("streaming per-entity watermark keeps only newer rows (T7)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EntityWatermark.Keyed]
    val q = EntityWatermark.filterNewer(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_entities")
      .start()
    def ts(s: String) = Timestamp.valueOf(s)
    // batch 1: both pass (no state yet)
    input.addData(
      EntityWatermark.Keyed("s1", ts("2024-01-01 10:00:00")),
      EntityWatermark.Keyed("s2", ts("2024-01-01 11:00:00")))
    q.processAllAvailable()
    // batch 2: stale s1 dropped, fresh s1 kept, new entity s3 kept
    input.addData(
      EntityWatermark.Keyed("s1", ts("2024-01-01 09:00:00")),
      EntityWatermark.Keyed("s1", ts("2024-01-01 12:00:00")),
      EntityWatermark.Keyed("s3", ts("2024-01-01 08:00:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT entity, ts FROM wm_entities")
      .as[(String, Timestamp)].collect().toSet
    assert(rows === Set(
      ("s1", ts("2024-01-01 10:00:00")), ("s2", ts("2024-01-01 11:00:00")),
      ("s1", ts("2024-01-01 12:00:00")), ("s3", ts("2024-01-01 08:00:00"))))
  }

  test("image near-dup dedup: fused dHash + Hamming-LSH over decoded PNGs") {
    import graft.multimodal.Multimodal
    import java.awt.image.BufferedImage
    def pattern(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val w = 72; val h = 48
    def baseV(x: Int, y: Int) = ((x / 8) * 40 + (y / 8) * 25) % 256
    val base = pattern(w, h)(baseV)
    // per-pixel noise small vs the 40-step block structure
    val noisy = pattern(w, h)((x, y) => baseV(x, y) + ((x * 31 + y * 17) % 5) - 2)
    // a THUMBNAIL: half-size downscale of the same image — the 9×8
    // grid sampling makes the hash scale-invariant by construction
    val thumb = new BufferedImage(w / 2, h / 2, BufferedImage.TYPE_INT_RGB)
    locally {
      val g = thumb.createGraphics()
      g.drawImage(base, 0, 0, w / 2, h / 2, null)
      g.dispose()
    }
    // luminance-inverted: every gradient flips, hamming ≈ 64
    val other = pattern(w, h)((x, y) => 255 - baseV(x, y))
    val rows = Seq(
      (1L, png(base)), (2L, png(noisy)), (3L, png(thumb)), (4L, png(other)),
      (5L, Array[Byte](1, 2, 3)) // corrupt bytes: decode fails
    ).toDF("media_id", "content")
    val hashed = Multimodal.imageDHash(Multimodal.decodeImage(rows))
    val hs = hashed.select($"media_id", $"dhash").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hs(5L).isEmpty, "corrupt image must yield a NULL hash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L).get, hs(2L).get) <= 3,
      s"noise broke the hash: ${ham(hs(1L).get, hs(2L).get)} bits")
    assert(ham(hs(1L).get, hs(3L).get) <= 3,
      s"thumbnail broke the hash: ${ham(hs(1L).get, hs(3L).get)} bits")
    assert(ham(hs(1L).get, hs(4L).get) > 10,
      s"inverted image hashed too close: ${ham(hs(1L).get, hs(4L).get)} bits")
    // the SQL surface agrees with the Column API
    GraftExtensions.install(spark)
    hashed.createOrReplaceTempView("dhash_imgs")
    val viaSql = spark.sql(
      """SELECT media_id, dhash64(pixels, img_width, img_height) AS d
        |FROM dhash_imgs""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(viaSql === hs, "SQL dhash64 diverged from the Column API")
    // the pair stage is the text-SimHash Hamming-LSH plan verbatim
    val pairs = Multimodal.imageNearDupPairs(hashed, "media_id")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)), pairs.toString)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "false positive")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "NULL-hash row leaked into pairing")
  }

  test("video near-dup: frame dHash overlap pairs re-encodes and sub-clips, not strangers") {
    import graft.multimodal.{AviMjpeg, Multimodal}
    // structured MJPEG frames: 4px x-blocks so the 9-point dHash grid
    // samples at block starts (w=36 → multiples of 4) and gradients
    // are 40-step — far above JPEG noise. Content k varies the block
    // slopes; a re-encode shifts intensity by +1 (gradient-invariant).
    def frame(k: Int, shift: Int): Array[Byte] = {
      val w = 36; val h = 16
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((((x / 4) * (1 + k % 3) + (y / 2) * (1 + k % 5)) * 40
          + 60 + shift) % 256) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", out))
      out.toByteArray
    }
    def avi(ks: Seq[Int], shift: Int): Array[Byte] =
      aviBytes(ks.map(frame(_, shift)), 36, 16)
    val vids = Seq(
      ("A", avi(Seq(0, 1, 2, 3), 0)),
      ("B", avi(Seq(0, 1, 2, 3), 1)),        // re-encode of A
      ("C", avi(Seq(10, 11, 12, 13), 0)),    // unrelated contents
      ("D", avi(Seq(2, 3), 1)),              // sub-clip of A, re-encoded
      ("E", Array[Byte](9, 9, 9))            // corrupt container
    ).toDF("vid", "content")
    val frames = AviMjpeg.extractFrames(vids)
    val hashed = Multimodal.imageDHash(
      Multimodal.decodeImage(frames, contentCol = "frame"))
    val pairs = Multimodal.videoNearDupPairs(hashed, "vid", "frame_idx",
        minOverlap = 0.5)
      .select($"vid_a", $"vid_b", $"overlap")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // full re-encode: every frame matches, overlap 1.0 both sides
    assert(pairs.get(("A", "B")).contains(1.0), pairs.toString)
    // SUB-CLIP duplication: D's side is fully contained — the
    // containment-style max catches it even though A's side is 0.5
    assert(pairs.get(("A", "D")).contains(1.0), pairs.toString)
    assert(pairs.contains(("B", "D")))
    // strangers and the corrupt container stay unpaired
    assert(!pairs.keySet.exists(p => p._1 == "C" || p._2 == "C"),
      s"stranger paired: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == "E" || p._2 == "E"))
  }

  test("simhashPairs star cap: identical-fingerprint pile-ups expand linearly") {
    import graft.functions.DedupOps
    // the multimodal degenerate case: solid frames / silence all hash
    // identically, so one band bucket holds the whole pile. Exact mode
    // goes quadratic; the cap switches to (min, member) star pairs —
    // linear, with the same keep-min dedup outcome
    val n = 40
    val sim = (0L until n).map(i => (i, "0" * 64)).toDF("id", "simhash")
    val exact = DedupOps.simhashPairs(sim, "id")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.size === n * (n - 1) / 2)
    val capped = DedupOps.simhashPairs(sim, "id", starBucketThreshold = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(capped.size === n - 1, s"star expansion not linear: ${capped.size}")
    assert(capped.forall(_._1 == 0L), "star pairs must anchor on the min id")
    // keep-min survivors agree: every non-min id is a loser either way
    assert(exact.map(_._2) === capped.map(_._2))
    // the degenerate-fingerprint COLLAPSE path: identical hashes fold
    // to their min-id rep BEFORE banding (no viral collect_set buffer),
    // members ride (rep, member, 0) star pairs. On a fixture with TWO
    // identical groups one Hamming bit apart, clustering and survivors
    // must equal the exact path's — the lossless-for-dedup contract —
    // while pair output stays linear in members
    val twoGroups = ((0L until n).map(i => (i, "0" * 64)) ++
      (100L until 100L + n).map(i => (i, "0" * 63 + "1")))
      .toDF("id", "simhash")
    val exact2 = DedupOps.simhashPairs(twoGroups, "id")
    val collapsed2 = DedupOps.simhashPairs(twoGroups, "id",
      collapseIdentical = true)
    assert(collapsed2.count() === 2L * (n - 1) + 1,
      "collapsed pairs must be linear: one star per member + one rep-rep edge")
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      DedupOps.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(collapsed2) === comps(exact2),
      "collapse must preserve connected components")
    // hamming values on star pairs are the true distance (identical = 0)
    assert(collapsed2.filter($"hamming" === 0).count() === 2L * (n - 1))
  }

  test("media dedup wrappers collapse identical fingerprints BY DEFAULT; video overlap stays pair-complete") {
    import graft.multimodal.Multimodal
    // the r11 probe's lesson: the star cap linearizes a bucket only
    // past the threshold — a sub-cap identical group still expands
    // quadratically, and identical hashes are the NORM off text. So
    // the dedup wrappers must take the collapse path with NO
    // caller-side flag: an n-member identical pile yields n-1 star
    // pairs anchored on the min id, not C(n,2)
    val n = 12
    val imgs = (0L until n).map(i => (i, 7L)).toDF("media_id", "dhash")
    val defPairs = Multimodal.imageNearDupPairs(imgs, "media_id")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(defPairs.size === n - 1,
      s"default image path is not collapse-shaped: ${defPairs.size} pairs")
    assert(defPairs.forall(_._1 == 0L), "stars must anchor on the min id")
    // the pair-complete path stays available by explicit opt-out
    assert(Multimodal.imageNearDupPairs(imgs, "media_id",
      collapseIdentical = false).count() === n.toLong * (n - 1) / 2)
    // the audio wrapper rides the same default
    val auds = (0L until n).map(i => (i, 7L)).toDF("media_id", "ahash")
    assert(Multimodal.audioNearDupPairs(auds, "media_id").count()
      === (n - 1).toLong)
    // video frame-overlap is the pair-complete consumer and must opt
    // out INTERNALLY: with all four frames identical, both matched
    // counts are full — the collapse path would report matched_a = 1
    // (only the rep frame appears on the a-side of cross-video pairs)
    val frames = Seq(("A", 0L, 7L), ("A", 1L, 7L), ("B", 0L, 7L),
      ("B", 1L, 7L)).toDF("vid", "frame_idx", "dhash")
    val v = Multimodal.videoNearDupPairs(frames, "vid", "frame_idx").collect()
    assert(v.length === 1)
    assert(v(0).getAs[Long]("matched_a") === 2L, v.mkString(","))
    assert(v(0).getAs[Long]("matched_b") === 2L, v.mkString(","))
    assert(v(0).getAs[Double]("overlap") === 1.0)
  }

  test("audio near-dup: spectrogram hash pairs re-levels/resamples, not other clips") {
    import graft.multimodal.Multimodal
    import graft.expressions.GraftExtensions
    // every (window, band) cell carries energy with ≥4× steps between
    // adjacent windows (amplitude pattern c ∈ {0.2..1.0}, never equal
    // across consecutive windows), so the rise/fall bits never compare
    // numerical leakage against numerical leakage and small additive
    // noise cannot flip them
    def clip(perWin: Int, gain: Double, noise: Double,
             pat: (Int, Int) => Int): Array[Double] = {
      val T = 9; val B = 8
      Array.tabulate(T * perWin) { i =>
        val t = i / perWin
        val ph = (i % perWin).toDouble / perWin
        var v = 0.0
        var b = 1
        while (b <= B) {
          val c = 0.2 + (pat(t, b) % 5) * 0.2
          v += c * math.sin(2.0 * math.Pi * b * ph)
          b += 1
        }
        gain * v + noise *
          ((((i * 1103515245 + 12345) & 0x7fffffff).toDouble /
            Int.MaxValue) - 0.5)
      }
    }
    val basePat = (t: Int, b: Int) => t * 7 + b * 3
    val otherPat = (t: Int, b: Int) => t * 11 + b * 9 + 2
    val rows = Seq(
      (1L, clip(400, 1.0, 0.0, basePat)),
      (2L, clip(400, 0.3, 0.02, basePat)), // re-leveled + light noise
      (3L, clip(800, 1.0, 0.0, basePat)),  // resampled 2x
      (4L, clip(400, 1.0, 0.0, otherPat)), // different clip
      (5L, null.asInstanceOf[Array[Double]]) // decode failure upstream
    ).toDF("media_id", "samples")
    val hashed = Multimodal.audioHash(rows)
    val hs = hashed.select($"media_id", $"ahash").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hs(5L).isEmpty, "null samples must yield a NULL hash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L).get, hs(2L).get) <= 3,
      s"re-level+noise broke the hash: ${ham(hs(1L).get, hs(2L).get)} bits")
    assert(hs(3L).get === hs(1L).get,
      "resampling must land in the same time x band cells")
    assert(ham(hs(1L).get, hs(4L).get) > 10,
      s"different clip hashed too close: ${ham(hs(1L).get, hs(4L).get)} bits")
    // SQL surface parity
    GraftExtensions.install(spark)
    hashed.createOrReplaceTempView("ahash_rows")
    val viaSql = spark.sql(
      "SELECT media_id, audio_hash64(samples) AS a FROM ahash_rows")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(viaSql === hs)
    // pairing rides the shared Hamming-LSH machinery
    val pairs = Multimodal.audioNearDupPairs(hashed, "media_id")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)), pairs.toString)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), pairs.toString)
  }

  test("tokenDistributionDrift: hand-computed JSD, identical and disjoint edges") {
    import graft.functions.DriftOps
    // source "s": bucket 0 = {a:2/3, b:1/3}, bucket 1 = {a:1/4, b:3/4}
    // source "same": identical distributions → JSD exactly 0
    // source "disj": disjoint supports → JSD exactly 1 (the base-2 max)
    val docs = Seq(
      (0L, "a a b", "s"), (1L, "a b b b", "s"),
      (2L, "x y", "same"), (3L, "y x", "same"),
      (4L, "p p q", "disj"), (5L, "r r r", "disj"),
      (6L, "z z", "only") // bucket 1 EMPTY: the vanished-source edge
    ).toDF("doc_id", "text", "source")
    val got = DriftOps.tokenDistributionDrift(docs, "source", "text",
        $"doc_id" % 2)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    def term(p: Double, q: Double) =
      if (p > 0) p * lg2(2 * p / (p + q)) * 0.5 else 0.0
    val want = Seq((2.0 / 3, 1.0 / 4), (1.0 / 3, 3.0 / 4))
      .map { case (pa, pb) => term(pa, pb) + term(pb, pa) }.sum
    assert(got("s")._1 === 3L && got("s")._2 === 4L)
    assert(math.abs(got("s")._3 - want) < 1e-6, s"${got("s")._3} vs $want")
    assert(got("same") === ((2L, 2L, 0.0)))
    assert(got("disj") === ((3L, 3L, 1.0)))
    // a source missing from one day surfaces as a NaN row (maximal
    // drift for the caller to flag), NOT an ANSI divide-by-zero that
    // would kill the monitoring job on the exact event it watches for
    assert(got("only")._1 === 2L && got("only")._2 === 0L)
    assert(got("only")._3.isNaN, got("only").toString)
  }

  test("bench noise gate: retries on a loaded host, keeps the quietest attempt") {
    // the r15 lesson: the calibration canary read 95% jitter while the
    // harness recorded a 48 s q51 that was really 1.28 s — the gate
    // must RE-RUN a noisy attempt and stamp the record either way
    var calls = 0
    val jitters = Seq(0.95, 0.40, 0.08) // loaded → settling → idle
    def attempt(): (Double, String) = {
      val j = jitters(calls); calls += 1; (j, s"payload$calls")
    }
    val (j, payload, n) = Bench.retryUntilQuiet(5, 0.25)(attempt _)
    assert(n === 3, "must retry until the canary clears the gate")
    assert(j === 0.08 && payload === "payload3")

    // quiet first attempt: no retry at all
    calls = 0
    val (j1, _, n1) = Bench.retryUntilQuiet(5, 0.25)(() => { calls += 1; (0.02, "p") })
    assert(n1 === 1 && j1 === 0.02 && calls === 1)

    // never-quiet host: bounded attempts, QUIETEST one wins, and the
    // caller's noisy_host stamp fires (jitter still above the gate)
    var seq2 = Seq(0.90, 0.60, 0.75)
    val (j2, p2, n2) = Bench.retryUntilQuiet(3, 0.25)(() => {
      val h = seq2.head; seq2 = seq2.tail; (h, s"a$h")
    })
    assert(n2 === 3 && j2 === 0.60 && p2 === "a0.6")
    assert(j2 > 0.25, "caller stamps noisy_host from exactly this check")

    // jitterOf: the canary itself — stddev/median of the interleaved
    // calibration samples; a constant series is 0, a spiky one is large
    assert(Bench.jitterOf(Seq(1.0, 1.0, 1.0)) === 0.0)
    assert(Bench.jitterOf(Seq(1.0)) === 0.0) // too few samples
    val spiky = Bench.jitterOf(Seq(0.5, 0.6, 37.0))
    assert(spiky > 5.0, s"spike must scream: $spiky")
  }
}
