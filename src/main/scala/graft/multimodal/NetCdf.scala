package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM netCDF *classic* (CDF-1 / CDF-2 64-bit-offset) reader
  * (SURVEY §2.1 S18).
  *
  * Implements the public netCDF classic on-disk format — the container
  * the reference's satellite flow reads with xarray
  * (satelite/satellite_utils.py:481-510: open dataset, take the
  * `lat`/`lon` coordinate variables and the data grid, flatten to
  * (latitude, longitude, value) rows). Scope: the classic binary layout
  * only — header (dims, attributes, variables), fixed and record
  * variables, all six primitive types, big-endian, with CF
  * `scale_factor`/`add_offset`/`_FillValue` unpacking. netCDF-4/HDF5
  * files are out of scope (different container; no codec lib here).
  *
  * Everything is driver/executor-local byte parsing over one file's
  * content — the distributed fan-out lives in [[Raster.gridFlattenNetCdf]]
  * (one file row → rows×cols cell rows inside the scan partition).
  */
object NetCdf {

  final case class Dim(name: String, length: Int) { def isRecord: Boolean = length == 0 }
  /** Attribute value: chars collapse to a String, numerics to doubles. */
  final case class Att(name: String, text: Option[String], nums: Array[Double])
  final case class Variable(name: String, dimIds: Seq[Int], atts: Seq[Att],
                            ncType: Int, vsize: Long, begin: Long)
  final case class NcFile(version: Int, numRecs: Int, dims: IndexedSeq[Dim],
                          gatts: Seq[Att], vars: Seq[Variable]) {
    def variable(name: String): Variable =
      vars.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"no variable '$name' (have: ${vars.map(_.name).mkString(", ")})"))
    def isRecordVar(v: Variable): Boolean = v.dimIds.headOption.exists(dims(_).isRecord)
    /** Shape with the record dim resolved to numrecs. */
    def shape(v: Variable): Seq[Int] =
      v.dimIds.map(d => if (dims(d).isRecord) numRecs else dims(d).length)
  }

  private val NcByte = 1; private val NcChar = 2; private val NcShort = 3
  private val NcInt = 4; private val NcFloat = 5; private val NcDouble = 6
  private val TagDim = 0x0A; private val TagVar = 0x0B; private val TagAtt = 0x0C

  private def elemSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(s"bad nc_type $other")
  }

  private def skipPad(b: ByteBuffer, consumed: Int): Unit = {
    val pad = (4 - consumed % 4) % 4
    b.position(b.position() + pad)
  }

  private def readName(b: ByteBuffer): String = {
    val n = b.getInt()
    val bytes = new Array[Byte](n)
    b.get(bytes)
    skipPad(b, n)
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** tag_list = ABSENT (0,0) | tag nelems [elem ...] */
  private def readTagged[T](b: ByteBuffer, expectTag: Int)(one: ByteBuffer => T): Seq[T] = {
    val tag = b.getInt()
    val n = b.getInt()
    if (tag == 0) { require(n == 0, "ABSENT list must be (0,0)"); Nil }
    else {
      require(tag == expectTag, f"expected tag 0x$expectTag%02X, got 0x$tag%02X")
      (0 until n).map(_ => one(b))
    }
  }

  private def readAtt(b: ByteBuffer): Att = {
    val name = readName(b)
    val t = b.getInt()
    val n = b.getInt()
    if (t == NcChar) {
      val bytes = new Array[Byte](n)
      b.get(bytes); skipPad(b, n)
      Att(name, Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)),
        Array.empty)
    } else {
      val vals = Array.tabulate(n)(_ => readScalar(b, t))
      skipPad(b, n * elemSize(t))
      Att(name, None, vals)
    }
  }

  private def readScalar(b: ByteBuffer, t: Int): Double = t match {
    case NcByte => b.get().toDouble
    case NcChar => (b.get() & 0xff).toDouble
    case NcShort => b.getShort().toDouble
    case NcInt => b.getInt().toDouble
    case NcFloat => b.getFloat().toDouble
    case NcDouble => b.getDouble()
  }

  def parseHeader(bytes: Array[Byte]): NcFile = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(b.get() == 'C'.toByte && b.get() == 'D'.toByte && b.get() == 'F'.toByte,
      "not a netCDF classic file (bad magic)")
    val version = b.get().toInt
    require(version == 1 || version == 2,
      s"unsupported version byte $version — classic CDF-1/CDF-2 only (netCDF-4/HDF5 needs a different container)")
    val numRecs = b.getInt() // 0xFFFFFFFF = STREAMING; treated as unknown
    val dims = readTagged(b, TagDim) { bb =>
      Dim(readName(bb), bb.getInt())
    }.toIndexedSeq
    val gatts = readTagged(b, TagAtt)(readAtt)
    val vars = readTagged(b, TagVar) { bb =>
      val name = readName(bb)
      val nd = bb.getInt()
      val dimIds = (0 until nd).map(_ => bb.getInt())
      val atts = readTagged(bb, TagAtt)(readAtt)
      val t = bb.getInt()
      val vsize = bb.getInt().toLong & 0xffffffffL
      val begin = if (version == 1) bb.getInt().toLong & 0xffffffffL else bb.getLong()
      Variable(name, dimIds, atts, t, vsize, begin)
    }
    NcFile(version, numRecs, dims, gatts, vars)
  }

  private[multimodal] def attNum(v: Variable, name: String): Option[Double] =
    v.atts.find(_.name == name).flatMap(_.nums.headOption)

  private[multimodal] def attText(v: Variable, name: String): Option[String] =
    v.atts.find(_.name == name).flatMap(_.text)

  /** Read a numeric variable row-major as doubles, with CF unpacking:
    * raw == _FillValue → NaN, else raw*scale_factor + add_offset.
    * Record variables read record-by-record across the interleaved
    * record block (stride = Σ vsize of all record variables). */
  def readNumeric(bytes: Array[Byte], nc: NcFile, varName: String): Array[Double] = {
    val v = nc.variable(varName)
    require(v.ncType != NcChar, s"'$varName' is NC_CHAR, not numeric")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val fill = attNum(v, "_FillValue")
    val scale = attNum(v, "scale_factor").getOrElse(1.0)
    val offset = attNum(v, "add_offset").getOrElse(0.0)
    def unpack(raw: Double): Double =
      if (fill.exists(_ == raw)) Double.NaN else raw * scale + offset

    if (!nc.isRecordVar(v)) {
      val n = nc.shape(v).product
      b.position(v.begin.toInt)
      Array.tabulate(n)(_ => unpack(readScalar(b, v.ncType)))
    } else {
      require(nc.numRecs >= 0, // 0xFFFFFFFF = STREAMING sentinel
        s"'$varName' is a record variable but numrecs is the STREAMING " +
          "sentinel — record count unknown; streaming-mode files are unsupported")
      val recVars = nc.vars.filter(nc.isRecordVar)
      // single record variable: data is NOT padded per spec; stride is
      // the exact record byte count, not the padded vsize
      val perRec = nc.shape(v).drop(1).product
      val stride =
        if (recVars.size == 1) perRec.toLong * elemSize(v.ncType)
        else recVars.map(_.vsize).sum
      val out = new Array[Double](nc.numRecs * perRec)
      var r = 0
      while (r < nc.numRecs) {
        b.position((v.begin + r * stride).toInt)
        var i = 0
        while (i < perRec) {
          out(r * perRec + i) = unpack(readScalar(b, v.ncType))
          i += 1
        }
        r += 1
      }
      out
    }
  }

  /** The reference's read_netcdf shape: coordinate vars + a 2D grid var →
    * one (lat, lon, value) tuple per cell, row-major, handling either
    * (lat,lon) or (lon,lat) dim order. NaN cells (fill) are kept — the
    * downstream quality filter decides, as in the reference. */
  def flattenGrid(bytes: Array[Byte], latVar: String = "lat",
                  lonVar: String = "lon", dataVar: String = "Band1"
                 ): Iterator[(Double, Double, Double)] = {
    val nc = parseHeader(bytes)
    val lats = readNumeric(bytes, nc, latVar)
    val lons = readNumeric(bytes, nc, lonVar)
    val data = readNumeric(bytes, nc, dataVar)
    val v = nc.variable(dataVar)
    val latDim = nc.variable(latVar).dimIds.head
    val lonDim = nc.variable(lonVar).dimIds.head
    val latFirst = v.dimIds == Seq(latDim, lonDim)
    require(latFirst || v.dimIds == Seq(lonDim, latDim),
      s"'$dataVar' dims ${v.dimIds} are not the ($latVar, $lonVar) grid")
    for {
      i <- Iterator.range(0, lats.length)
      j <- Iterator.range(0, lons.length)
    } yield {
      val x = if (latFirst) data(i * lons.length + j) else data(j * lats.length + i)
      (lats(i), lons(j), x)
    }
  }
}
