package graft.connectors

import graft.core.SchemaNormalizer
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Google Sheets / Drive sources (SURVEY §2.1 S12–S13).
  *
  * The reference's `download_url` task handles three URL types
  * (utils/dump_url/tasks.py:37-140): `google_sheet` — open the sheet by
  * URL, select a worksheet by name or by zero-based index, optionally a
  * sub-range, promote the first row to the header and normalize the
  * column names (remove_columns_accents, utils/utils.py:542-565);
  * `google_drive` — extract the FILE_ID from the URL path and download
  * the media in chunks; `direct` — plain streamed GET
  * ([[Http.downloadToLanding]]).
  *
  * Spark-first shape: the worksheet grid is fetched ONCE on the driver
  * (a sheet is product-capped at ~10M cells — never cluster-scale),
  * landed on the default (shared) filesystem, and parsed distributed
  * via `spark.read.csv`. Transports are injected functions so worksheet
  * selection, header promotion and id extraction are all testable
  * offline; the production transports live here too.
  */
object GSuite {

  val SheetsUrlPrefix = "https://docs.google.com/spreadsheets/d/"
  val DriveUrlPrefix = "https://drive.google.com/file/d/"

  /** Worksheet addressing — by name, or by gid. The reference also
    * selects by zero-based order (`gsheets_sheet_order`, tasks.py:85-89);
    * gid is NOT positional (added/reordered sheets get arbitrary gids),
    * so order-based selection needs the sheet-metadata call an
    * authenticated client would make — only gid 0 reliably means "first
    * worksheet of an untouched spreadsheet". */
  sealed trait Worksheet
  final case class ByName(name: String) extends Worksheet
  final case class ByGid(gid: Long) extends Worksheet

  /** Spreadsheet id from a canonical Sheets URL; same prefix validation
    * as the reference (tasks.py:68-75). */
  def spreadsheetId(url: String): String = {
    require(url.startsWith(SheetsUrlPrefix),
      s"URL must start with $SheetsUrlPrefix — invalid URL: $url")
    url.stripPrefix(SheetsUrlPrefix).split("[/?#]")(0)
  }

  /** FILE_ID from a canonical Drive URL (tasks.py:108-121). */
  def driveFileId(url: String): String = {
    require(url.startsWith(DriveUrlPrefix),
      s"URL must start with $DriveUrlPrefix — invalid URL: $url")
    url.stripPrefix(DriveUrlPrefix).split("[/?#]")(0)
  }

  /** CSV-export URL for one worksheet: the gviz endpoint serves a
    * worksheet as CSV without an API client — by `sheet=` name or
    * `gid=`; `range=` narrows to A1 notation. */
  def exportCsvUrl(spreadsheetId: String, ws: Worksheet,
                   range: Option[String] = None): String = {
    val sel = ws match {
      case ByName(n) => s"sheet=${java.net.URLEncoder.encode(n, "UTF-8")}"
      case ByGid(g) => s"gid=$g"
    }
    val r = range.map(a1 => s"&range=$a1").getOrElse("")
    s"$SheetsUrlPrefix$spreadsheetId/gviz/tq?tqx=out:csv&$sel$r"
  }

  /** S12: one worksheet → DataFrame. First grid row becomes the header
    * (the reference's `new_header = dataframe.iloc[0]` promotion), then
    * every column name is accent-stripped/underscored/lowercased
    * exactly like remove_columns_accents. All values stay STRING — the
    * reference dumps to CSV untyped; typing is the staging layer's job
    * ([[graft.core.SchemaNormalizer.conform]]). */
  def readSheet(spark: SparkSession, t: Http.Transport, url: String,
                ws: Worksheet = ByGid(0),
                range: Option[String] = None): DataFrame = {
    val body = t(exportCsvUrl(spreadsheetId(url), ws, range))
    csvWithPromotedHeader(spark, body)
  }

  /** Header promotion + name normalization over a raw CSV payload,
    * parsed DRIVER-SIDE with the CSV engine Spark itself bundles
    * (univocity) — quoted cells with literal newlines survive exactly as
    * spark.read's `multiLine` mode would keep them.
    *
    * No scratch file: the body is already a driver-resident String (the
    * transport returned it), and a worksheet is bounded by the Sheets
    * product cap (10M cells), so parsing in place and parallelizing the
    * rows is right-sized — earlier versions landed a temp CSV per read
    * and leaked one scratch file per sheet for the life of the driver
    * (deleteOnExit only fires at FileSystem close). */
  def csvWithPromotedHeader(spark: SparkSession, csvBody: String): DataFrame = {
    import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val settings = new CsvParserSettings
    settings.getFormat.setDelimiter(',')
    settings.getFormat.setQuote('"')
    settings.getFormat.setQuoteEscape('"') // gviz CSV doubles quotes
    settings.setMaxCharsPerColumn(-1)
    // match what the previous spark.read path accepted, not univocity's
    // defaults: Sheets sheets can exceed 512 columns (Spark's own CSV
    // reader allows 20480); cell whitespace is DATA (spark.read does not
    // trim unquoted cells by default); gviz emits \r\n, so detect the
    // separator instead of trusting the platform default + trim
    settings.setMaxColumns(20480)
    settings.setIgnoreLeadingWhitespaces(false)
    settings.setIgnoreTrailingWhitespaces(false)
    settings.setLineSeparatorDetectionEnabled(true)
    // spark.read parity continued: univocity defaults would silently
    // DROP rows whose first cell starts with '#' (comment processing)
    // and turn quoted-empty cells ("") into null
    settings.setCommentProcessingEnabled(false)
    settings.setEmptyValue("")
    val grid = new CsvParser(settings)
      .parseAll(new java.io.StringReader(csvBody))
    if (grid.isEmpty) return spark.emptyDataFrame
    val header = grid.get(0).toIndexedSeq
      .map(h => Option(h).getOrElse(""))
    val width = header.length
    val rows = (1 until grid.size).map { r =>
      val cells = grid.get(r)
      Row.fromSeq(Seq.tabulate(width)(c => if (c < cells.length) cells(c) else null))
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 50000 + 1)),
      schema)
    SchemaNormalizer.normalizeSchema(df)
  }

  /** Ranged fetch: (url, startByte, maxBytes) → chunk (short/empty chunk
    * = EOF), mirroring MediaIoBaseDownload's next_chunk loop. */
  type RangeTransport = (String, Long, Int) => Array[Byte]

  /** Production ranged transport: HTTP Range requests. One client (and
    * connection pool) serves every chunk of the download; non-2xx
    * responses throw rather than letting an error payload masquerade as
    * file bytes (416 past-EOF is the loop's normal termination). */
  def javaRangeTransport(timeoutSeconds: Int = 60,
                         headers: Map[String, String] = Map.empty): RangeTransport = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()
    (url, start, maxBytes) =>
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .header("Range", s"bytes=$start-${start + maxBytes - 1}")
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      resp.statusCode() match {
        case 416 => Array.emptyByteArray
        case ok if ok >= 200 && ok < 300 => resp.body()
        case bad => throw new java.io.IOException(
          s"ranged GET $url [$start, +$maxBytes) returned HTTP $bad")
      }
  }

  /** S13: chunked Drive media download to a landing file (the
    * reference's while-not-done next_chunk loop, tasks.py:125-135).
    * Bounded memory: one chunk resident at a time, appended straight to
    * disk. Returns the landing path for the downstream spark.read. */
  def downloadDriveFile(t: RangeTransport, url: String, destPath: String,
                        chunkSize: Int = 1 << 20): String = {
    val fileId = driveFileId(url)
    val mediaUrl = s"https://www.googleapis.com/drive/v3/files/$fileId?alt=media"
    val dest = java.nio.file.Paths.get(destPath)
    Option(dest.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val out = java.nio.file.Files.newOutputStream(dest,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      var offset = 0L
      var done = false
      while (!done) {
        val chunk = t(mediaUrl, offset, chunkSize)
        out.write(chunk)
        offset += chunk.length
        done = chunk.length < chunkSize
      }
    } finally out.close()
    destPath
  }
}
