package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ODIM_H5 polar-volume decode (SURVEY §2.1 S19) — the radar input the
  * reference opens with h5py/wradlib (process_ppi.py:73-143) before the
  * PPI compute that [[RadarPpi]] re-expresses.
  *
  * ODIM layout read here (OPERA data information model for HDF5):
  *   /what                 source attr ("WMO:...,RAD:...")
  *   /where                site lat, lon, height
  *   /dataset{N}/where     elangle, rstart (km), rscale (m)
  *   /dataset{N}/how       startazA / stopazA per-ray azimuths (optional)
  *   /dataset{N}/data{M}/what   quantity (DBZH...), gain, offset,
  *                              nodata, undetect
  *   /dataset{N}/data{M}/data   nrays × nbins raw counts (u8/u16)
  *
  * Decode semantics matching the reference's masking: raw == nodata →
  * null bin (no measurement: blocked/beyond range — wradlib masks NaN);
  * everything else stays a RAW count — [[RadarPpi.slotValues]] applies
  * gain·raw + offset per ray, so `undetect` (usually raw 0) lands on the
  * offset baseline exactly as wradlib's unpacking does.
  *
  * The container parse is [[Hdf5]], executor-local per file; the
  * distributed fan-out is [[rays]]: binary file rows → one row per ray
  * per elevation, inside the scan partitions.
  */
object OdimH5 {

  val raySchema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("elangle", DoubleType),
    StructField("start_az", DoubleType),
    StructField("stop_az", DoubleType),
    StructField("gain", DoubleType),
    StructField("offset", DoubleType),
    StructField("bins", ArrayType(DoubleType, containsNull = true))))

  /** Geometry of one scan (dataset group). Keyed by DATASET, not by
    * elangle: operational split-cut volumes repeat an elevation angle
    * across scans with different gate spacings, and an elangle-keyed map
    * would silently keep whichever parsed last. */
  final case class ScanMeta(dataset: String, elangle: Double,
                            rscaleM: Double, rstartKm: Double)

  /** Site + per-scan geometry for the geo steps downstream of the ray
    * frame ([[RadarPpi.cappi]]/[[RadarPpi.toGeo]] take these as
    * parameters). */
  final case class OdimMeta(source: String, lat: Double, lon: Double,
                            heightM: Double, scans: Seq[ScanMeta])

  private def datasetGroups(f: Hdf5.H5File): Seq[(String, Hdf5.H5Object)] = {
    val root = f.objectAt(f.rootAddr)
    root.children.keys.toSeq
      .filter(_.matches("dataset\\d+"))
      .sortBy(_.stripPrefix("dataset").toInt)
      .map(n => n -> f.resolve(s"/$n"))
  }

  /** The data group under one dataset carrying the wanted quantity —
    * exact match first, else the first data group that declares no
    * quantity, else none (scan skipped). */
  private def dataGroup(f: Hdf5.H5File, dsName: String, scan: Hdf5.H5Object,
                        quantity: String): Option[String] = {
    val dataNames = scan.children.keys.toSeq
      .filter(_.matches("data\\d+")).sortBy(_.stripPrefix("data").toInt)
    def quantityOf(d: String): Option[String] =
      if (f.exists(s"/$dsName/$d/what"))
        f.resolve(s"/$dsName/$d/what").attrs.get("quantity").flatMap(_.text)
      else None
    dataNames.find(d => quantityOf(d).exists(_.equalsIgnoreCase(quantity)))
      .orElse(dataNames.find(d => quantityOf(d).isEmpty))
  }

  def sourceOf(f: Hdf5.H5File, fallback: String): String =
    if (f.exists("/what"))
      f.resolve("/what").attrs.get("source").flatMap(_.text).getOrElse(fallback)
    else fallback

  def meta(bytes: Array[Byte], fallbackSource: String = "radar"): OdimMeta = {
    val f = Hdf5.open(bytes)
    val where = f.resolve("/where").attrs
    val scans = datasetGroups(f).flatMap { case (name, _) =>
      if (!f.exists(s"/$name/where")) Nil
      else {
        val w = f.resolve(s"/$name/where").attrs
        for (el <- w.get("elangle").map(_.num).toSeq)
          yield ScanMeta(name, el,
            w.get("rscale").map(_.num).getOrElse(Double.NaN),
            w.get("rstart").map(_.num).getOrElse(0.0))
      }
    }
    OdimMeta(sourceOf(f, fallbackSource),
      where.get("lat").map(_.num).getOrElse(Double.NaN),
      where.get("lon").map(_.num).getOrElse(Double.NaN),
      where.get("height").map(_.num).getOrElse(Double.NaN),
      scans)
  }

  /** One volume's bytes → per-ray rows matching [[raySchema]] (the
    * [[RadarPpi.slotValues]] input contract). */
  def rays(bytes: Array[Byte], fallbackSource: String,
           quantity: String = "DBZH"): Iterator[Row] = {
    val f = Hdf5.open(bytes)
    val source = sourceOf(f, fallbackSource)
    datasetGroups(f).iterator.flatMap { case (dsName, scan) =>
      dataGroup(f, dsName, scan, quantity) match {
        case None => Iterator.empty
        case Some(d) =>
          val elangle = f.resolve(s"/$dsName/where").attrs("elangle").num
          val what = f.resolve(s"/$dsName/$d/what").attrs
          val gain = what.get("gain").map(_.num).getOrElse(1.0)
          val offset = what.get("offset").map(_.num).getOrElse(0.0)
          val nodata = what.get("nodata").map(_.num)
          val data = f.resolve(s"/$dsName/$d/data")
          require(data.dims.length == 2,
            s"/$dsName/$d/data is ${data.dims.length}-D, want rays × bins")
          val Seq(nrays, nbins) = data.dims
          val raw = f.readData(data)
          def azArr(attr: String): Option[Array[Double]] =
            if (f.exists(s"/$dsName/how"))
              f.resolve(s"/$dsName/how").attrs.get(attr).map(_.nums)
                .filter(_.length == nrays)
            else None
          val startAz = azArr("startazA")
          val stopAz = azArr("stopazA")
          val step = 360.0 / nrays
          Iterator.range(0, nrays).map { r =>
            val bins = new Array[Any](nbins)
            var j = 0
            while (j < nbins) {
              val v = raw(r * nbins + j)
              bins(j) = if (nodata.exists(_ == v)) null else Double.box(v)
              j += 1
            }
            Row(source, elangle,
              startAz.map(_(r)).getOrElse(r * step),
              stopAz.map(_(r)).getOrElse((r + 1) * step),
              gain, offset, bins.toSeq)
          }
      }
    }
  }

  /** S19 distributed decode: media rows ([[Multimodal.mediaSchema]]:
    * `content` binary + `meta.source`) → the ray frame. Decode happens
    * inside the scan partitions — a season of volumes fans out to rays
    * without the driver ever seeing a byte of HDF5. Feed the result to
    * [[RadarPpi.voxels]] → cmax/cavg/cappi → toGeo. */
  def raysFrame(media: DataFrame, quantity: String = "DBZH"): DataFrame = {
    import media.sparkSession.implicits._
    media.select($"meta.source".as("source"), $"content")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (src, bytes) => rays(bytes, src, quantity) }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(raySchema))
  }
}
