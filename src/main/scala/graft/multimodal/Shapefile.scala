package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Pure-JVM ESRI shapefile (.shp) reader → WKT rows (SURVEY §1.1 geo
  * layer; the reference's boundary polygons ship as shapefiles read
  * with cartopy's shpreader — satellite_utils.py:631-642 — and feed
  * the same polygon layer our point-in-polygon/bbox operators consume).
  *
  * Implements the public ESRI whitepaper format (1998): 100-byte main
  * header (file code 9994, type, bbox), then records of
  * (big-endian record header, little-endian shape content). Shape
  * types: 0 null (skipped), 1 point, 3 polyline, 5 polygon — the types
  * the reference's fixtures use. Polygon ring grouping follows the
  * spec's orientation rule: outer rings are clockwise, holes
  * counter-clockwise; consecutive CCW rings attach as holes to the
  * preceding outer, and multiple outers yield a MULTIPOLYGON.
  *
  * Only the .shp main file is needed (geometry); the sidecar .shx index
  * is redundant for a full scan and .dbf attributes are a separate
  * concern (the reference's own fixtures ship without .dbf).
  */
object Shapefile {

  val schema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("record_id", IntegerType),
    StructField("wkt", StringType)))

  final case class Shape(recordNumber: Int, wkt: String)

  def parse(bytes: Array[Byte]): Iterator[Shape] = {
    require(bytes != null && bytes.length >= 100,
      s"not a shapefile (${if (bytes == null) "null" else s"${bytes.length} bytes"}, header is 100)")
    val header = ByteBuffer.wrap(bytes, 0, 100).order(ByteOrder.BIG_ENDIAN)
    require(header.getInt(0) == 9994, "not a shapefile (bad file code)")
    val fileLenBytes = header.getInt(24).toLong * 2
    require(ByteBuffer.wrap(bytes, 28, 4).order(ByteOrder.LITTLE_ENDIAN)
      .getInt == 1000, "unsupported shapefile version")
    new Iterator[Shape] {
      private var off = 100L
      private var nextShape: Shape = advance()
      private def advance(): Shape = {
        while (off + 8 <= math.min(fileLenBytes, bytes.length)) {
          val rh = ByteBuffer.wrap(bytes, off.toInt, 8).order(ByteOrder.BIG_ENDIAN)
          val recNo = rh.getInt
          val contentLen = rh.getInt.toLong * 2
          require(off + 8 + contentLen <= bytes.length,
            s"truncated shapefile: record $recNo claims $contentLen content bytes " +
              s"at offset ${off + 8} but the file has ${bytes.length}")
          val content = ByteBuffer.wrap(bytes, (off + 8).toInt, contentLen.toInt)
            .order(ByteOrder.LITTLE_ENDIAN)
          off += 8 + contentLen
          val wkt = shapeWkt(content)
          if (wkt != null) return Shape(recNo, wkt)
        }
        null
      }
      override def hasNext: Boolean = nextShape != null
      override def next(): Shape = {
        val s = nextShape; nextShape = advance(); s
      }
    }
  }

  /** One shape record's content → WKT, or null for null shapes. */
  private def shapeWkt(b: ByteBuffer): String = b.getInt() match {
    case 0 => null // null shape — no geometry
    case 1 =>
      s"POINT (${b.getDouble} ${b.getDouble})"
    case 3 =>
      val parts = readParts(b)
      if (parts.length == 1) s"LINESTRING ${ringText(parts.head)}"
      else parts.map(ringText).mkString("MULTILINESTRING (", ", ", ")")
    case 5 =>
      val rings = readParts(b)
      // spec: outer = clockwise (negative shoelace area), holes CCW.
      // Ring ORDER within a record is NOT significant per the ESRI
      // whitepaper, so holes are assigned to the outer that CONTAINS
      // them (first-vertex ray cast) — attaching to the preceding outer
      // would misplace holes in [outerA, outerB, holeOfA] files. A hole
      // no outer contains degrades to its own outer (pyshp behavior).
      val (outerRings, holeRings) = rings.partition(r =>
        signedArea(r) <= 0 || rings.length == 1)
      val polys = outerRings.map(r =>
        scala.collection.mutable.ArrayBuffer(r)).toBuffer
      holeRings.foreach { hole =>
        val (hx, hy) = hole.head
        // innermost containing outer (smallest |area|): with NESTED
        // outers (island-in-lake-in-island) the first match in ring
        // order could be the enclosing grandparent
        val containing = polys.filter { p =>
          val outer = p.head
          graft.expressions.PointInPolygon.contains(
            hx, hy, outer.map(_._1), outer.map(_._2))
        }
        if (containing.isEmpty)
          polys += scala.collection.mutable.ArrayBuffer(hole)
        else containing.minBy(p => math.abs(signedArea(p.head))) += hole
      }
      def polyText(rs: Seq[Array[(Double, Double)]]): String =
        rs.map(ringText).mkString("(", ", ", ")")
      if (polys.length == 1) s"POLYGON ${polyText(polys.head.toSeq)}"
      else polys.map(p => polyText(p.toSeq)).mkString("MULTIPOLYGON (", ", ", ")")
    case other =>
      throw new IllegalArgumentException(s"unsupported shape type $other")
  }

  /** bbox + parts/points arrays of polyline/polygon content. */
  private def readParts(b: ByteBuffer): Array[Array[(Double, Double)]] = {
    b.position(b.position() + 32) // skip bbox
    val numParts = b.getInt()
    val numPoints = b.getInt()
    // counts come from RECORD CONTENT (unlike record headers, which are
    // length-validated in parse()): a corrupt/hostile 4-byte count would
    // drive Array.fill into a multi-GB allocation and OOM the executor
    // before any BufferUnderflowException fired. Bound them against the
    // bytes actually present: 4 per part index, 16 per point.
    require(numParts >= 0 && numPoints >= 0 &&
      4L * numParts + 16L * numPoints <= b.remaining(),
      s"corrupt shapefile record: $numParts parts / $numPoints points " +
        s"exceed ${b.remaining()} remaining content bytes")
    val partStarts = Array.fill(numParts)(b.getInt())
    val pts = Array.fill(numPoints)((b.getDouble(), b.getDouble()))
    Array.tabulate(numParts) { i =>
      val end = if (i + 1 < numParts) partStarts(i + 1) else numPoints
      pts.slice(partStarts(i), end)
    }
  }

  private def ringText(ring: Array[(Double, Double)]): String =
    ring.map { case (x, y) => s"$x $y" }.mkString("(", ", ", ")")

  /** Shoelace; shapefile outer rings (CW) come out negative. */
  private def signedArea(ring: Array[(Double, Double)]): Double = {
    var acc = 0.0
    var i = 0
    while (i < ring.length - 1) {
      acc += ring(i)._1 * ring(i + 1)._2 - ring(i + 1)._1 * ring(i)._2
      i += 1
    }
    acc / 2.0
  }

  /** Distributed scan: .shp files → (source, record_id, wkt) rows, the
    * decode fanning out inside the scan partitions like every other
    * binary format here. */
  def readShp(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    Multimodal.readBinaryFiles(spark, glob)
      .select($"meta.source".as("source"), $"content")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (src, bytes) =>
          parse(bytes).map(s => Row(src, s.recordNumber, s.wkt))
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
  }
}
