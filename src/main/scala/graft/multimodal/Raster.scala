package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Raster → table flattening (SURVEY §2.1 S18/S19, §2.10 U6).
  *
  * The reference decodes GOES-16 netCDF grids and radar `.vol` PPI
  * sweeps into flat (lat, lon, value) tables
  * (satelite/satellite_utils.py:250-460, process_ppi.py:105-543).
  * The Spark shape: binary file rows → mapPartitions generator → one row
  * per grid cell, with the geo transform applied per cell. All decoders
  * are real pure-JVM parsers ([[NetCdf]], [[GeosProjection]], and the
  * [[Hdf5]]/[[OdimH5]] radar path) — parsing and the rows×cols fan-out
  * happen inside the scan partitions, never on the driver.
  */
object Raster {

  val gridSchema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("value", DoubleType)))

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

  /** S18 second half: ABI-shaped netCDF (x/y fixed-grid scan angles +
    * `goes_imager_projection`) → (source, lat, lon, value) rows via the
    * closed-form geostationary inverse ([[GeosProjection]]) — the
    * reference's `remap_g16` (satellite_utils.py:452-478) without a
    * raster lib. Off-disk cells are dropped, fill → null. */
  def gridFlattenGoesAbi(media: DataFrame, xVar: String = "x",
                         yVar: String = "y", dataVar: String = "CMI",
                         projVar: String = "goes_imager_projection"): DataFrame = {
    import media.sparkSession.implicits._
    media.select($"meta.source".as("source"), $"content")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (src, bytes) =>
          GeosProjection.flattenAbi(bytes, xVar, yVar, dataVar, projVar)
            .map { case (lat, lon, v) =>
              Row(src, lat, lon, if (v.isNaN) null else v)
            }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(gridSchema))
  }
}
