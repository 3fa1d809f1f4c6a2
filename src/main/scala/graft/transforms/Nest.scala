package graft.transforms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key/content JSON nesting (SURVEY §2.8 F14, §2.10 U5).
  *
  * `transform_raw_to_nested_structure` (rj_smtr/tasks.py:1403-1505) and
  * `to_json_dataframe` (utils/utils.py:657-688): keep pk columns, pack all
  * other fields into a `content` JSON string, stamp `timestamp_captura`.
  * Built-in `to_json(struct(...))` keeps this inside codegen; the grouped
  * variant packs one JSON array per key group.
  */
object Nest {

  /** Pack non-pk columns into a `content` JSON string per row. */
  def toContent(df: DataFrame, pk: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(pk.contains).map(col)
    df.select(pk.map(col) :+
      to_json(struct(payload.toIndexedSeq: _*)).as("content"): _*)
  }

  /** Grouped variant: one JSON array of records per pk group, ordered by
    * `orderCols` for determinism (collect_list alone is partition-order
    * dependent). */
  def toGroupedContent(df: DataFrame, pk: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload =
      orderCols ++ df.columns.filterNot(c => pk.contains(c) || orderCols.contains(c))
    df.groupBy(pk.map(col): _*)
      .agg(to_json(array_sort(collect_list(struct(payload.map(col): _*))))
        .as("content"))
  }
}
