package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lake partition-column derivation (SURVEY §1.1, §2.2 K3/K4).
  *
  * The reference derives `ano_particao/mes_particao/data_particao` from a
  * configured date column (utils/utils.py:885-922) and the SMTR capture
  * path uses `data=YYYY-MM-DD/hora=HH` (rj_smtr/tasks.py:329-348).
  * Partition values are STRINGS (zero-padded) to match Hive-style dirs.
  */
object Partitions {

  /** ano/mes/data partition triple from a timestamp/date column. */
  def yearMonthDate(df: DataFrame, dateCol: String): DataFrame =
    df.withColumn("ano_particao", date_format(col(dateCol), "yyyy"))
      .withColumn("mes_particao", date_format(col(dateCol), "MM"))
      .withColumn("data_particao", date_format(col(dateCol), "yyyy-MM-dd"))

  /** data/hora partition pair (capture-path layout). */
  def dateHour(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("data", date_format(col(tsCol), "yyyy-MM-dd"))
      .withColumn("hora", date_format(col(tsCol), "HH"))

  /** Distinct partition tuples present in a frame (A6 — what a
    * partitioned write will touch; used for idempotent overwrite scoping). */
  def touched(df: DataFrame, partitionCols: Seq[String]): DataFrame =
    df.select(partitionCols.map(col): _*).distinct()
}
