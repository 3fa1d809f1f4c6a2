package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided testdata tables (TESTDATA.md).
  *
  * Parquet written by pyarrow carries timestamp columns as
  * isAdjustedToUTC=false, which Spark 4 reads as TIMESTAMP_NTZ. We cast
  * those to TIMESTAMP (session tz is pinned UTC everywhere) so that all
  * timestamp arithmetic matches the DuckDB oracle, which treats the same
  * columns as naive timestamps.
  *
  * `events.ts` is TIMESTAMP(NANOS), which Spark refuses to read natively;
  * we read it as a nanosecond long (legacy flag) and floor-divide to
  * microseconds — exactly what DuckDB does when it truncates nanos.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Column known to be nanosecond-precision in the driver testdata. */
  private val nanosCols = Map("events" -> Set("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val nanos = nanosCols.getOrElse(name, Set.empty)
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampNTZType => col(f.name).cast(TimestampType).as(f.name)
        case LongType if nanos(f.name) =>
          expr(s"timestamp_micros(${f.name} div 1000)").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
