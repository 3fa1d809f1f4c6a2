package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The three-zone lake and its writers (SURVEY §1.1, §2.2 K1–K7).
  *
  * Zones raw/staging/prod mirror the reference's GCS layout
  * (rj_smtr/tasks.py:384-429, rj_smtr/utils.py:136-200). Writes are:
  *
  *  - `append`: plain file-add (replaces the reference's read-concat-
  *    rewrite "append", utils/utils.py:499-506 — union semantics, but
  *    O(new data) instead of O(table));
  *  - `overwritePartitions`: dynamic partition overwrite — the Spark
  *    equivalent of delete-partition-blobs-then-upload
  *    (utils/dump_db/tasks.py:400-435) and the key to idempotent replay;
  *  - `createOrAppend`: K5 — register the external table in the session
  *    catalog on first write, append afterwards.
  *
  * At cluster scale every write is partition-parallel; nothing funnels
  * through the driver.
  */
final case class TableRef(zone: String, dataset: String, table: String)

class Lake(spark: SparkSession, root: String) {

  def path(ref: TableRef): String = s"$root/${ref.zone}/${ref.dataset}/${ref.table}"

  private def qualified(ref: TableRef): String =
    s"${ref.zone}_${ref.dataset}.${ref.table}"

  /** Cluster the frame by its partition columns before a partitioned
    * write: without this every task holds a writer per touched partition
    * dir (tasks × dirs small files — the classic 100 TB lake killer);
    * with it each dir is written by exactly one task. */
  private def aligned(df: DataFrame, partitionBy: Seq[String]): DataFrame =
    if (partitionBy.isEmpty) df
    else df.repartition(partitionBy.map(col): _*)

  /** K1/K2/K3: partitioned append (CSV kept for raw-zone parity, parquet
    * default). */
  def append(df: DataFrame, ref: TableRef, partitionBy: Seq[String] = Nil,
             format: String = "parquet"): Unit = {
    val w = aligned(df, partitionBy).write.format(format).mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path(ref))
  }

  /** K6: idempotent re-write of exactly the partitions present in `df`
    * (dynamic partition overwrite — untouched partitions survive). */
  def overwritePartitions(df: DataFrame, ref: TableRef,
                          partitionBy: Seq[String]): Unit =
    aligned(df, partitionBy).write.format("parquet")
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*)
      .save(path(ref))

  /** K7: full table reset. */
  def overwriteAll(df: DataFrame, ref: TableRef,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path(ref))
  }

  /** K5: create the catalog external table on first append, else append;
    * table schema is discovered from the files (schema-on-read). */
  def createOrAppend(df: DataFrame, ref: TableRef,
                     partitionBy: Seq[String] = Nil): Unit = {
    append(df, ref, partitionBy)
    val db = s"${ref.zone}_${ref.dataset}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${qualified(ref)}
         |USING parquet LOCATION '${path(ref)}'""".stripMargin)
    if (partitionBy.nonEmpty) spark.sql(s"MSCK REPAIR TABLE ${qualified(ref)}")
  }

  /** Schema-on-read scan of a lake table (partition discovery included).
    * `mergeSchema` unions the schemas of all files, so a capture that
    * started emitting a new column mid-history reads as one table with
    * nulls for the older files — the reference gets this for free from
    * BigQuery schema updates; parquet needs the footer merge. */
  def read(ref: TableRef, mergeSchema: Boolean = false): DataFrame =
    spark.read.option("mergeSchema", mergeSchema).parquet(path(ref))

  /** Small-file compaction: rewrite the table into ~`targetFileBytes`
    * files. Minute-cadence captures append one small file per tick per
    * partition — a year of that is ~5×10⁵ files per table, and scan
    * planning starts to cost more than scanning. File count is sized
    * from the optimizer's own byte statistics (no extra pass over the
    * data). A table cannot be overwritten from its own live scan, so the
    * compacted copy lands in a sibling dir and is swapped in with two
    * renames (the [[graft.state.StateStore]] discipline: rename results
    * checked, never a window where both copies are gone). */
  def compact(ref: TableRef, partitionBy: Seq[String] = Nil,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val scan = read(ref)
    val bytes = scan.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = (BigInt(1).max(
      (bytes + targetFileBytes - 1) / targetFileBytes)).toInt
    val compacted =
      if (partitionBy.isEmpty) scan.coalesce(nFiles)
      else aligned(scan, partitionBy) // one writer task (= file) per dir
    import org.apache.hadoop.fs.Path
    val p = new Path(path(ref))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path(ref) + ".compact")
    val old = new Path(path(ref) + ".old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val w = compacted.write.format("parquet").mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compaction swap $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // best-effort restore
      throw new java.io.IOException(s"compaction swap $tmp -> $p failed")
    }
    fs.delete(old, true)
  }

  /** Bucketed catalog table write: rows are hash-clustered (and sorted)
    * by the join key at write time, so equi-joins and aggregations
    * between tables bucketed on the same key run WITHOUT a shuffle —
    * the co-location strategy for the lake's biggest recurring joins
    * (fact↔fact on orderkey-like keys at 100 TB). */
  def writeBucketed(df: DataFrame, ref: TableRef, bucketCol: String,
                    numBuckets: Int): Unit = {
    val db = s"${ref.zone}_${ref.dataset}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    df.write.format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path(ref))
      .saveAsTable(s"$db.${ref.table}")
  }
}
