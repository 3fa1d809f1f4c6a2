package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** String/value cleaning treatments (SURVEY §2.8 F3–F7).
  *
  * Mirrors the reference's pre-treatment semantics — strip all string
  * columns (rj_smtr/tasks.py:1455-1458), scrub control chars and
  * string-nulls (utils/utils.py:516-539), value-replace maps
  * (precipitacao_alertario/tasks.py:179) — as pure Column expressions so
  * everything stays inside whole-stage codegen.
  */
object Clean {

  /** F3: trim every string column (skipping `exclude`, e.g. nested JSON). */
  def trimStrings(df: DataFrame, exclude: Set[String] = Set.empty): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType && !exclude(f.name)) trim(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** F6: remove control characters and map literal "None"/"nan"/"" to null. */
  def scrub(c: Column): Column =
    nullif(nullif(nullif(
      regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""),
      lit("None")), lit("nan")), lit(""))

  /** F7: value-replace map (e.g. "ND"/"-" → null sentinel handling). */
  def replaceValues(c: Column, mapping: Map[String, Option[String]]): Column =
    mapping.foldLeft(c) { case (acc, (from, to)) =>
      when(acc === lit(from), to.map(lit).getOrElse(lit(null).cast(StringType)))
        .otherwise(acc)
    }

  /** F4: capitalize — first letter upper, rest lower (pandas .capitalize). */
  def capitalize(c: Column): Column =
    concat(upper(c.substr(lit(1), lit(1))), lower(c.substr(lit(2), length(c))))

  /** F12: safe cast with default (rj_smtr/utils.py:325-332). */
  def safeCast(c: Column, to: String, default: Column): Column =
    coalesce(c.try_cast(to), default)

  /** F13: numeric coerce + negative clamp to null
    * (precipitacao_alertario/tasks.py:300-310). */
  def coerceNonNegative(c: Column): Column = {
    val d = c.try_cast("double")
    when(d < 0, lit(null).cast("double")).otherwise(d)
  }
}
