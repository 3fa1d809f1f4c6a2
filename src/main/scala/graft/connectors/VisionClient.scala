package graft.connectors

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Remote vision/LLM classification client (SURVEY §2.10 U7's remote
  * half; reference: rj_escritorio/flooding_detection/tasks.py:63-170
  * `get_prediction` — POST a prompt + base64 JPEG to an OpenAI-style
  * chat-completions endpoint, parse a JSON label out of the reply).
  *
  * Same testability contract as [[Http]]: the transport is an injected
  * function, so request shape and response parsing are spec'd offline
  * and the production transport is one `javaPostTransport` swap. Same
  * executor contract as [[graft.multimodal.Multimodal.batchInfer]]: the
  * client is built ONCE per partition (`mkTransport` runs at iterator
  * open — connection pool / auth header amortized across the
  * partition's rows), rows stream through without driver collection.
  *
  * The reference's per-row guards are preserved: a row not flagged for
  * classification short-circuits to label=false without an API call;
  * a NULL/empty image yields label=NULL (unknown), as does an `error`
  * response or unparseable reply — a 100 TB scan must record the
  * failure, not die on it (same policy as
  * [[graft.multimodal.Multimodal.decodeImage]]).
  */
object VisionClient {

  /** (jsonRequestBody) => jsonResponseBody. Endpoint/auth/timeout are
    * baked into the transport, mirroring [[Http.Transport]]. */
  type PostTransport = String => String

  final case class Config(
      model: String,
      prompt: String,
      labelKey: String = "flooding_detected",
      maxTokens: Int = 300,
      imageFormat: String = "jpeg")

  /** Production transport: blocking JSON POST (tasks.py:141 request
    * shape — `Content-Type: application/json` + bearer auth). One
    * client/connection pool per transport instance. */
  def javaPostTransport(url: String, apiKey: String,
                        timeoutSeconds: Int = 60): PostTransport = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()
    body =>
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .header("Content-Type", "application/json")
        .header("Authorization", s"Bearer $apiKey")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  // ObjectMapper is expensive to build and thread-safe after config:
  // one per JVM, shared by every partition's rows (Scala objects are
  // re-instantiated per executor JVM, so nothing here is serialized)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Chat-completions request payload (tasks.py:127-156): model +
    * one user message carrying [text prompt, data-URL image] +
    * max_tokens. Built with Jackson (ships inside Spark) so prompt
    * text is JSON-escaped correctly — no hand-rolled string quoting. */
  def requestBody(cfg: Config, imageBytes: Array[Byte]): String = {
    val m = mapper
    val root = m.createObjectNode()
    root.put("model", cfg.model)
    val msg = m.createObjectNode()
    msg.put("role", "user")
    val content = m.createArrayNode()
    val text = m.createObjectNode()
    text.put("type", "text")
    text.put("text", cfg.prompt)
    content.add(text)
    val img = m.createObjectNode()
    img.put("type", "image_url")
    val imgUrl = m.createObjectNode()
    imgUrl.put("url", s"data:image/${cfg.imageFormat};base64," +
      java.util.Base64.getEncoder.encodeToString(imageBytes))
    img.set("image_url", imgUrl)
    content.add(img)
    msg.set("content", content)
    root.set("messages", m.createArrayNode().add(msg))
    root.put("max_tokens", cfg.maxTokens)
    m.writeValueAsString(root)
  }

  /** Parse `choices[0].message.content` — a JSON object the model was
    * prompted to emit, possibly wrapped in a ```json fence (the
    * reference strips "```json\n"/"\n```", tasks.py:160-164; this strip
    * also survives CRLF and single-line fences, which would otherwise
    * turn EVERY reply of such an endpoint into silent NULLs while
    * still paying for the calls) — and read the boolean at `labelKey`.
    * None = unknown: an `error` payload, a malformed reply, a
    * missing/non-boolean key. */
  def parseLabel(cfg: Config, responseJson: String): Option[Boolean] =
    try {
      val root = mapper.readTree(responseJson)
      if (root.has("error")) None
      else {
        val content = root.path("choices").path(0).path("message")
          .path("content").asText("").trim
        val stripped =
          if (content.startsWith("```"))
            content.stripPrefix("```json").stripPrefix("```")
              .stripSuffix("```").trim
          else content
        val label = mapper.readTree(stripped).path(cfg.labelKey)
        if (label.isBoolean) Some(label.asBoolean) else None
      }
    } catch { case _: Exception => None }

  /** Classify a frame of images: input rows + nullable BOOLEAN
    * `outCol`. `attemptCol` (nullable — absent treated as true)
    * reproduces the reference's attempt_classification gate: false →
    * label false, NO api call (tasks.py:108-115). One POST per
    * attempted row — remote vision endpoints are per-image; wrap the
    * transport with [[RateLimited.rateLimited]] to respect a provider
    * QPS cap, and keep the frame `repartition`-ed to the parallelism
    * the provider allows, not the cluster's.
    */
  def classify(df: DataFrame, cfg: Config, mkTransport: () => PostTransport,
               contentCol: String = "content",
               attemptCol: Option[String] = None,
               outCol: String = "label"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BooleanType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    // plan-time field resolution — chained typed operators hand over
    // schema-less rows (see Multimodal.decodeImage)
    val contentIdx = df.schema.fieldIndex(contentCol)
    val attemptIdx = attemptCol.map(df.schema.fieldIndex)
    df.mapPartitions { rows =>
      // init: ONE client per partition (batchInfer's init contract)
      lazy val transport = mkTransport()
      rows.map { r =>
        // three-way gate: NULL attempt is UNKNOWN (serve null, no
        // call) — folding it into false would push a confident
        // "no flood" into the smoothing buffer for a camera the
        // caller's join simply missed
        val attemptUnknown = attemptIdx.exists(r.isNullAt)
        val attempt = attemptIdx.forall(i =>
          !r.isNullAt(i) && r.getBoolean(i))
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val label: Any =
          if (attemptUnknown) null
          else if (!attempt) java.lang.Boolean.FALSE
          else if (bytes == null || bytes.isEmpty) null
          else {
            // a transport failure (timeout, reset) serves NULL like any
            // other unknown — letting it escape would retry the WHOLE
            // partition, re-billing the endpoint for every image in it
            val resp =
              try Some(transport(requestBody(cfg, bytes)))
              catch { case scala.util.control.NonFatal(_) => None }
            resp.flatMap(parseLabel(cfg, _))
              .map(java.lang.Boolean.valueOf).orNull
          }
        Row.fromSeq(r.toSeq :+ label)
      }
    }(enc)
  }
}
