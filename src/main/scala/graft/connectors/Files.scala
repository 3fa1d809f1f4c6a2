package graft.connectors

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-shaped capture sources (SURVEY §2.1 S9–S15).
  *
  * - S9 zip-object scan: `binaryFile` + per-partition unzip of the member
  *   matching the table id (rj_smtr/utils.py:689-765);
  * - S10 filename→partition parsing (rdo/tasks.py:35-130);
  * - S14 chunked CSV: native partitioned csv read with the reference's
  *   permissive/encoding/sep knobs (utils/dump_url/tasks.py:147-180);
  * - S15 GeoJSON: features → properties + WKT geometry
  *   (utils/dump_datario/tasks.py:75-117).
  */
object Files {

  /** S9: read zip blobs, extract the first member whose name contains
    * `memberLike`, return (path, member, text) rows. Decompression runs
    * inside the scan partitions — no driver funnel. */
  def readZipMembers(spark: SparkSession, glob: String,
                     memberLike: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filter(e => !e.isDirectory && e.getName.contains(memberLike))
          .map { e =>
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            Iterator.continually(zin.read(buf)).takeWhile(_ > 0)
              .foreach(n => out.write(buf, 0, n))
            (path, e.getName, out.toString("UTF-8"))
          }.toIndexedSeq.iterator
      })
      .toDF("path", "member", "text")
  }

  /** S10: derive ano/mes/dia partition columns from the input FILE NAME
    * (pattern ..._YYYYMMDD...; anchored to the basename so digits in
    * parent directories never match). */
  def withFilenamePartitions(df: DataFrame): DataFrame = {
    val pat = "(\\d{4})(\\d{2})(\\d{2})[^/]*$"
    df.withColumn("ano", regexp_extract(input_file_name(), pat, 1))
      .withColumn("mes", regexp_extract(input_file_name(), pat, 2))
      .withColumn("dia", regexp_extract(input_file_name(), pat, 3))
  }

  /** S14: chunked CSV — Spark's partitioned reader IS the chunking; the
    * reference's knobs map to options. */
  def readCsv(spark: SparkSession, path: String, sep: String = ",",
              encoding: String = "UTF-8", permissive: Boolean = true,
              header: Boolean = true): DataFrame =
    spark.read
      .option("sep", sep)
      .option("encoding", encoding)
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
      .option("header", header)
      .csv(path)

  /** S15: GeoJSON FeatureCollection → one row per feature with WKT
    * geometry (POINT/POLYGON, 3D coords dropped to 2D). */
  def readGeoJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val feats = raw.select(explode(col("features")).as("f"))
    val coords = col("f.geometry.coordinates")
    val gtype = col("f.geometry.type")
    val wkt = when(gtype === "Point",
      concat(lit("POINT ("),
        element_at(coords, 1).cast("string"), lit(" "),
        element_at(coords, 2).cast("string"), lit(")")))
      .otherwise(lit(null).cast("string"))
    feats.select(col("f.properties.*"), wkt.as("geometry_wkt"))
  }
}
