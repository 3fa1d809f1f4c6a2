package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup treatments (SURVEY §2.3 P7/P8, §2.6 W3).
  *
  * P7 (drop_duplicates by pk subset, …onibus_gps/tasks.py:246-248) and
  * P8 (sort-then-keep-first, …alertario/tasks.py:313-314). The ordered
  * variant is the deterministic one — use it whenever downstream results
  * are compared across runs; `dropDuplicates` keeps an arbitrary row.
  */
object Dedup {

  /** P7: dedup on a key subset; arbitrary survivor (cheapest — one shuffle
    * on the keys with map-side partial aggregation). */
  def byKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** P8/W3: keep the first row per key under an explicit ordering.
    * One shuffle on the keys; whole-stage-codegen window. */
  def keepFirstOrdered(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
