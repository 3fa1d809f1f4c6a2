package graft.core

import java.text.Normalizer

import graft.expressions.Unaccent.unaccent
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema/name normalization (SURVEY §1.3, §2.8 F1).
  *
  * The reference infers column names from cursor metadata or file headers
  * and normalizes them: NFKD accent strip, whitespace/slash→underscore,
  * lowercase, leading `_` for numeric-leading names
  * (utils/utils.py:542-565,925-935); missing contract columns are
  * null-backfilled (rj_cor/comando/eventos/tasks.py:226-228).
  */
object SchemaNormalizer {

  /** F1, driver-side: normalize one column NAME. */
  def normalizeName(name: String): String = {
    val stripped = Normalizer.normalize(name, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}+", "")
    // Locale.ROOT: "ID" must slug to "id" on every driver locale —
    // Turkish toLowerCase yields "ıd", an invalid identifier char
    // that the [^a-z0-9_] strip would silently delete (review-found)
    val slug = stripped.trim.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[\\s/\\\\.-]+", "_")
      .replaceAll("[^a-z0-9_]", "")
      .replaceAll("_+", "_")
      .stripSuffix("_")
    if (slug.headOption.exists(_.isDigit)) "_" + slug else slug
  }

  /** Rename every column to its normalized form. */
  def normalizeSchema(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeName).toIndexedSeq: _*)

  /** F1 as a VALUE expression: slugify string data (codegen-friendly —
    * unaccent is a native expression, the rest built-ins). */
  def slugify(c: Column): Column =
    regexp_replace(
      regexp_replace(lower(unaccent(trim(c))), "[\\s/\\\\.-]+", "_"),
      "[^a-z0-9_]", "")

  /** Null-backfill contract columns the frame is missing, then project in
    * contract order (missing-expected-columns-as-null semantics). */
  def conform(df: DataFrame, contract: Seq[(String, String)]): DataFrame = {
    val have = df.columns.toSet
    contract.foldLeft(df) { case (acc, (name, typ)) =>
      if (have(name)) acc.withColumn(name, col(name).cast(typ))
      else acc.withColumn(name, lit(null).cast(typ))
    }.select(contract.map { case (n, _) => col(n) }: _*)
  }
}
