package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Raster → table flattening (SURVEY §2.1 S18/S19, §2.10 U6).
  *
  * The reference decodes GOES-16 netCDF grids and radar `.vol` PPI
  * sweeps into flat (lat, lon, value) tables
  * (satelite/satellite_utils.py:250-460, process_ppi.py:105-543).
  * The Spark shape: binary file rows → mapPartitions generator → one row
  * per grid cell, with the geo transform applied per cell.
  *
  * The byte-level codec is STUBBED (`decodeGridStub` synthesizes a
  * deterministic gridRows×gridCols raster from the bytes — no
  * netCDF/HDF5 libs in this container); everything Spark-side (generator
  * fan-out, schema, bbox projection) is real. A production decoder only
  * replaces the `cellValue` function.
  */
object Raster {

  final case class GridSpec(rows: Int, cols: Int,
                            latMin: Double, latMax: Double,
                            lonMin: Double, lonMax: Double)

  val gridSchema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("value", DoubleType)))

  /** U6 generator: each (source, content) row expands to rows×cols grid
    * cells. One input file can produce millions of rows — the expansion
    * happens inside the scan partitions, never on the driver. */
  def gridFlatten(media: DataFrame, spec: GridSpec): DataFrame = {
    import media.sparkSession.implicits._
    val latStep = (spec.latMax - spec.latMin) / math.max(spec.rows - 1, 1)
    val lonStep = (spec.lonMax - spec.lonMin) / math.max(spec.cols - 1, 1)
    media.select($"meta.source".as("source"), $"content")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // init point: a real netCDF/HDF5 reader opens its codec here
        it.flatMap { case (src, bytes) =>
          for {
            r <- Iterator.range(0, spec.rows)
            c <- Iterator.range(0, spec.cols)
          } yield Row(src,
            spec.latMin + r * latStep,
            spec.lonMin + c * lonStep,
            cellValue(bytes, r, c))
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(gridSchema))
  }

  /** S18, REAL decode: netCDF-classic files → (source, lat, lon, value)
    * rows using the pure-JVM [[NetCdf]] parser (coordinate variables +
    * 2D grid, CF scale/offset/fill unpacking — the read_netcdf →
    * to_dataframe flatten of satellite_utils.py:481-510). Parsing and
    * the rows×cols fan-out happen inside the scan partitions; a 5424²
    * full-disk grid becomes ~29M rows without ever touching the driver. */
  def gridFlattenNetCdf(media: DataFrame, latVar: String = "lat",
                        lonVar: String = "lon",
                        dataVar: String = "Band1"): DataFrame = {
    import media.sparkSession.implicits._
    media.select($"meta.source".as("source"), $"content")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (src, bytes) =>
          NetCdf.flattenGrid(bytes, latVar, lonVar, dataVar)
            .map { case (lat, lon, v) =>
              Row(src, lat, lon, if (v.isNaN) null else v)
            }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(gridSchema))
  }

  /** STUB codec: deterministic pseudo-measurement per cell. */
  private def cellValue(bytes: Array[Byte], r: Int, c: Int): Double = {
    if (bytes == null || bytes.isEmpty) 0.0
    else {
      val b = bytes((r * 31 + c * 17) % bytes.length) & 0xff
      b / 255.0 * 100.0
    }
  }
}
