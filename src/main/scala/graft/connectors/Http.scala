package graft.connectors

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** HTTP/API capture sources (SURVEY §2.1 S6–S8, S20).
  *
  * The reference GETs JSON/CSV payloads with secrets-injected headers and
  * a 60 s timeout (rj_smtr/utils.py:642-686), follows `$top/$skip` pages
  * until a short page (rj_smtr/utils.py:1069-1136), or a `next` cursor
  * until EOF (br_rj_riodejaneiro_sigmob/tasks.py:20-133).
  *
  * Transport is injected as a function so capture logic is testable
  * offline and swappable (java.net.http in production). Fetching happens
  * on the driver — these APIs are inherently non-splittable — but parsing
  * and everything downstream is distributed: pages land in a
  * Dataset[String] that spark.read.json schema-infers in parallel.
  */
object Http {

  type Transport = String => String

  /** Production transport: plain blocking GET with timeout. One client
    * (and connection pool) serves every call of the returned transport —
    * paged captures reuse connections instead of re-handshaking. */
  def javaTransport(timeoutSeconds: Int = 60,
                    headers: Map[String, String] = Map.empty): Transport = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()
    url =>
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      headers.foreach { case (k, v) => b.header(k, v) }
      client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  /** Retry with backoff (reference: 500-retry w/ backoff, retries×10). */
  def withRetry(t: Transport, attempts: Int = 3,
                backoffMs: Long = 100): Transport = { url =>
    var last: Throwable = null
    var i = 0
    var out: String = null
    while (out == null && i < attempts) {
      try out = t(url)
      catch { case e: Throwable => last = e; i += 1; Thread.sleep(backoffMs * i) }
    }
    if (out == null) throw last
    out
  }

  /** S6: single JSON payload → DataFrame (schema inferred in parallel). */
  def readJson(spark: SparkSession, t: Transport, url: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(t(url)).toDS())
  }

  /** S11: direct URL download to a landing-zone file (streamed by the
    * transport; the landing file then enters via spark.read). */
  def downloadToLanding(t: Transport, url: String, destPath: String): String = {
    val body = t(url)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(destPath).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(destPath), body)
    destPath
  }

  /** S7: `$top/$skip` pagination — stop after the first short page
    * (which is included), or at maxPages. */
  def readPagedTopSkip(spark: SparkSession, t: Transport, baseUrl: String,
                       pageSize: Int = 1000, maxPages: Int = 100,
                       countFn: String => Int): DataFrame = {
    import spark.implicits._
    val pages = scala.collection.mutable.ArrayBuffer[String]()
    var p = 0
    var done = false
    while (!done && p < maxPages) {
      val body = t(s"$baseUrl?$$top=$pageSize&$$skip=${p * pageSize}")
      val n = countFn(body)
      if (n > 0) pages += body
      if (n < pageSize) done = true
      p += 1
    }
    spark.read.json(pages.toSeq.toDS())
  }

  /** S8: cursor pagination — follow nextFn(body) until None; each page is
    * fetched exactly once. */
  def readPagedCursor(spark: SparkSession, t: Transport, firstUrl: String,
                      nextFn: String => Option[String],
                      maxPages: Int = 1000): DataFrame = {
    import spark.implicits._
    val pages = scala.collection.mutable.ArrayBuffer[String]()
    var cur: Option[String] = Some(firstUrl)
    while (cur.isDefined && pages.size < maxPages) {
      val body = t(cur.get)
      pages += body
      cur = nextFn(body)
    }
    spark.read.json(pages.toSeq.toDS())
  }
}
