package graft.connectors

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTML table scrape (SURVEY §2.1 S17) — the alertario station tables
  * (rj_cor/meteorologia/precipitacao_alertario/tasks.py:40-102): parse
  * <table> rows, promote the header, handle decimal commas and "ND".
  *
  * Driver-side parse (pages are small); the resulting DataFrame is the
  * distributed hand-off point, as with every non-splittable source.
  */
object Scrape {

  private val rowPat = "(?is)<tr[^>]*>(.*?)</tr>".r
  private val cellPat = "(?is)<t[hd][^>]*>(.*?)</t[hd]>".r
  private val tagPat = "(?s)<[^>]+>".r

  /** Extract the first HTML table as header + string rows. */
  def parseTable(html: String): (Seq[String], Seq[Seq[String]]) = {
    val rows = rowPat.findAllMatchIn(html).map { m =>
      cellPat.findAllMatchIn(m.group(1))
        .map(c => tagPat.replaceAllIn(c.group(1), "").trim).toIndexedSeq
    }.filter(_.nonEmpty).toIndexedSeq
    if (rows.isEmpty) (Seq.empty, Seq.empty) else (rows.head, rows.tail)
  }

  /** S17: HTML → DataFrame with normalized column names; values stay
    * strings (all-STRING staging contract, typed later via safeCast). */
  def readHtmlTable(spark: SparkSession, html: String): DataFrame = {
    import spark.implicits._
    val (header, rows) = parseTable(html)
    val names = header.map(graft.core.SchemaNormalizer.normalizeName)
    val df = rows.map(r => r.padTo(names.size, "").take(names.size))
      .map { r => org.apache.spark.sql.Row.fromSeq(r) }
    val schema = org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(df.toIndexedSeq), schema)
  }

  /** Decimal-comma + "ND"/"-" handling for scraped numerics. */
  def scrapedNumber(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    regexp_replace(c, ",", ".").try_cast("double")
  }
}
