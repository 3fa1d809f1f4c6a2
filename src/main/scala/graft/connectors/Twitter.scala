package graft.connectors

import graft.core.SchemaNormalizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Twitter/X search capture (SURVEY §2.1 S20).
  *
  * The reference (rj_escritorio/tweets_flamengo/tasks.py:78-320) keeps a
  * last-captured tweet id per query, pages `search_tweets` with
  * `since_id` in batches of 100, flattens the nested tweet JSON with
  * pandas `json_normalize` (nested keys concatenated WITHOUT separator —
  * `entities.hashtags` → `entitieshashtags` — because its normalize_cols
  * strips dots), conforms to a fixed column contract, and stores the max
  * id back for the next run.
  *
  * Spark shape: the page bodies land in a Dataset[String] and
  * `spark.read.json` schema-infers distributed; the flatten is a generic
  * struct-column expansion (arrays — hashtags, mentions — stay arrays,
  * as in json_normalize); the since-id watermark lives in
  * [[graft.state.StateStore]] like every other cross-run state.
  */
final case class TwitterQuery(q: String, pageSize: Int = 100, maxPages: Int = 100)

object Twitter {

  /** State key for a query (the reference's q_folder normalization). */
  def stateKey(q: String): String =
    "twitter/" + q.replace(" ", "_").replace("-", "_")

  /** First-page search URL with the since-id lower bound. */
  def searchUrl(query: TwitterQuery, sinceId: Long): String =
    s"/1.1/search/tweets.json?q=${java.net.URLEncoder.encode(query.q, "UTF-8")}" +
      s"&since_id=$sinceId&count=${query.pageSize}"

  /** v1.1 cursor: `search_metadata.next_results` carries the next page's
    * query string; absent on the last page. */
  def nextResults(body: String): Option[String] =
    """"next_results"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(body)
      .map(m => "/1.1/search/tweets.json" +
        m.group(1).replace("\\u0026", "&"))

  /** Recursively expand struct columns, concatenating names WITHOUT a
    * separator (json_normalize + dot-stripping normalize_cols). Arrays
    * and scalars pass through. */
  def flattenStructs(df: DataFrame): DataFrame = {
    var cur = df
    while (cur.schema.fields.exists(_.dataType.isInstanceOf[StructType])) {
      val cols = cur.schema.fields.toIndexedSeq.flatMap { f =>
        f.dataType match {
          case st: StructType =>
            st.fieldNames.toIndexedSeq.map(n =>
              col(s"`${f.name}`.`$n`").as(f.name + n))
          case _ => Seq(col(s"`${f.name}`"))
        }
      }
      cur = cur.select(cols: _*)
    }
    SchemaNormalizer.normalizeSchema(cur)
  }

  /** S20 capture: all pages since `sinceId` → flattened frame. Statuses
    * ride under `statuses` in the v1.1 envelope; each page is fetched
    * once and parsing is distributed. */
  def capture(spark: SparkSession, t: Http.Transport, query: TwitterQuery,
              sinceId: Long): DataFrame = {
    val pages = Http.readPagedCursor(spark, t, searchUrl(query, sinceId),
      nextFn = nextResults, maxPages = query.maxPages)
    // No-new-tweets runs return {"statuses":[],...}: the inferred element
    // type is then not a struct and star-expansion would throw — the
    // empty frame is the correct result (reference logs "No new tweets").
    val statusesType = pages.schema.fields.find(_.name == "statuses").map(_.dataType)
    statusesType match {
      case Some(org.apache.spark.sql.types.ArrayType(_: StructType, _)) =>
        flattenStructs(
          pages.select(explode(col("statuses")).as("s")).select(col("s.*")))
      case _ => spark.emptyDataFrame
    }
  }

  /** The watermark to store for the next run: max captured id (the
    * reference takes the first row of the newest-first page). */
  def newLastId(captured: DataFrame, idCol: String = "id"): Option[Long] =
    if (!captured.columns.contains(idCol)) None // empty no-new-tweets frame
    else captured.agg(max(col(idCol))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
}
