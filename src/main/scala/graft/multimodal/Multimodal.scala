package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt requirement; reference
  * precedent: camera snapshot capture with base64 image columns,
  * rj_escritorio/flooding_detection/tasks.py:177-230, and satellite
  * raster decode, SURVEY §2.1 S18/S19/S22, §2.10 U6/U7).
  *
  * Media travels as an opaque `binary` column plus a typed metadata
  * struct. Decoders run batched per partition (`mapPartitions`) so a real
  * implementation amortizes codec/model setup per batch — exactly the
  * mapInPandas shape, minus pandas. IMAGE decode is REAL
  * ([[decodeImage]]: JDK `javax.imageio` — JPEG/PNG/GIF/BMP ship with
  * every JVM) and so is PCM AUDIO ([[decodeAudio]]: JDK
  * `javax.sound.sampled` — WAV/AIFF/AU), both zero extra dependencies.
  * VIDEO is real for Motion-JPEG ([[AviMjpeg]]: pure-JVM RIFF walk →
  * per-frame JPEGs → [[decodeImage]]); only inter-frame codecs
  * (H.264/VP9/…) stay stubbed ([[decodeStub]] — those genuinely
  * aren't in the JDK), with the distributed plumbing (schema,
  * batching, partitioning) identical.
  */
object Multimodal {

  /** Default viral-bucket cap for the multimodal near-dup pair joins —
    * FINITE here, unlike the text SimHash default (exact), because
    * degenerate fingerprints are the NORM off text: solid/black frames
    * all dHash to 0, silence audio-hashes to 0, and at corpus scale
    * those pile millions of ids into ONE Hamming band bucket whose
    * quadratic expansion would dominate the job. Past the cap a bucket
    * emits linear (min id, member) star pairs — lossless for keep-min
    * dedup on identical-fingerprint clusters, which is exactly what an
    * over-cap bucket is in this domain. */
  val DefaultStarBucketThreshold: Int = 4096

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("n_bytes", LongType),
      StructField("source", StringType))), nullable = false)))

  /** Wrap a binary payload column into the media schema. */
  def asMedia(df: DataFrame, idCol: String, binCol: String,
              format: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).cast("binary").as("content"),
      struct(lit(format).as("format"),
        length(col(binCol)).cast("long").as("n_bytes"),
        col(sourceCol).cast("string").as("source")).as("meta"))

  /** Load media files distributed (S22-shape): one row per object. */
  def readBinaryFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(monotonically_increasing_id().as("media_id"),
        col("content"),
        struct(lit("file").as("format"),
          col("length").cast("long").as("n_bytes"),
          col("path").as("source")).as("meta"))

  /** REAL image decode (S22): encoded JPEG/PNG/GIF/BMP bytes → 8-bit
    * grayscale pixel grid, via the JDK's own `javax.imageio` — zero
    * extra dependencies. Emits the input row + `pixels` (row-major
    * grayscale bytes, [[resizeRaw]]'s input format), `img_width`,
    * `img_height`. Grayscale uses the ITU-R BT.601 luma weights
    * (0.299 R + 0.587 G + 0.114 B) — the same Y' the reference's
    * cv2.cvtColor GRAY conversion computes
    * (rj_escritorio/flooding_detection/tasks.py:177-230 captures JPEG
    * frames; this is their decode step, executor-side).
    *
    * Corrupt or unrecognized payloads yield NULL pixels/dims instead of
    * failing the task: at 100 TB there WILL be truncated frames, and one
    * must not kill the job — filter `pixels IS NOT NULL` downstream
    * (the decode-failure count is then a plain agg). NonFatal is the
    * catch: the JDK plugin readers throw RuntimeExceptions (bad ICC
    * profiles, mismatched band counts), not just IOException. Declared
    * dimensions are bounded BEFORE pixel allocation (`maxPixels`) — a
    * 1 KB decompression bomb claiming 40000×40000 would otherwise
    * allocate gigabytes and OOM the executor (the Shapefile
    * hostile-count guard, applied to images). ImageIO's disk cache is
    * disabled per partition: scratch-file-per-image would thrash
    * executor /tmp at scale. */
  def decodeImage(df: DataFrame, contentCol: String = "content",
                  maxPixels: Long = 64L * 1024 * 1024): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("pixels", BinaryType),
      StructField("img_width", IntegerType),
      StructField("img_height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    // field index resolved at PLAN time: chained typed operators hand
    // over schema-less GenericRows (EliminateSerialization fuses the
    // serialize/deserialize pair away), so by-name getAs would throw
    val contentIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      // init: per-partition codec setup — memory-only decode streams
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val decoded: Option[(Array[Byte], Int, Int)] =
          if (bytes == null || bytes.isEmpty) None
          else try decodeBounded(bytes, maxPixels)
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some((px, w, h)) => Row.fromSeq(r.toSeq ++ Seq(px, w, h))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }(enc)
  }

  /** Decode with the declared dimensions checked BEFORE pixel
    * allocation: the header-level getWidth/getHeight read only the
    * image header, so a hostile header is rejected at ~zero cost. */
  private def decodeBounded(bytes: Array[Byte],
                            maxPixels: Long): Option[(Array[Byte], Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) None
          else Option(reader.read(0)).map(grayPixels)
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** BufferedImage → (row-major 8-bit grayscale, width, height).
    * BT.601 integer luma: (77 R + 150 G + 29 B) >> 8 — the classic
    * fixed-point form, exact enough that pure-gray inputs (R=G=B=v)
    * round-trip to v. */
  private[multimodal] def grayPixels(
      img: java.awt.image.BufferedImage): (Array[Byte], Int, Int) = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h)
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      val y = (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) +
        29 * (p & 0xff)) >> 8
      out(i) = y.toByte
      i += 1
    }
    (out, w, h)
  }

  /** Pixel grid → model-ready feature vector: intensities scaled to
    * [0, 1], row-major — [[batchInfer]]/[[LinearModel]]'s input. Run
    * AFTER [[resizeRaw]] so the dimension is the fixed target grid, not
    * the source resolution. NULL pixel rows (decode failures passed
    * through) yield NULL features. */
  def pixelFeatures(df: DataFrame, pixelsCol: String = "resized",
                    outCol: String = "features"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val pixelsIdx = df.schema.fieldIndex(pixelsCol) // see decodeImage
    df.mapPartitions { rows =>
      rows.map { r =>
        val px = r.get(pixelsIdx).asInstanceOf[Array[Byte]]
        val feats =
          if (px == null) null
          else px.map(b => (b & 0xff) / 255.0)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** REAL audio decode: WAV/AIFF/AU PCM bytes → normalized samples, via
    * the JDK's own `javax.sound.sampled` — the audio twin of
    * [[decodeImage]], zero extra dependencies. Emits the input row +
    * `samples` (doubles in [-1, 1], channels averaged to mono — the
    * standard feature-extraction mixdown), `sample_rate`, `n_channels`.
    * Same failure policy as images: corrupt/unsupported payloads (or
    * compressed codecs the JDK lacks — MP3/AAC) yield NULL, never a
    * task failure; filter `samples IS NOT NULL` downstream. */
  def decodeAudio(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("samples", ArrayType(DoubleType)),
      StructField("sample_rate", IntegerType),
      StructField("n_channels", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val contentIdx = df.schema.fieldIndex(contentCol) // see decodeImage
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val decoded: Option[(Array[Double], Int, Int)] =
          if (bytes == null || bytes.isEmpty) None
          else try pcmSamples(bytes)
          // NonFatal, not just Unsupported/IO: a corrupted fmt chunk
          // (zero channels, bogus frame size) surfaces as arithmetic /
          // array errors from the JDK parsers — same NULL-row policy
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some((s, rate, ch)) => Row.fromSeq(r.toSeq ++ Seq(s, rate, ch))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }(enc)
  }

  /** Container bytes → (mono samples in [-1, 1], rate, channels). PCM
    * signed 16-bit and unsigned 8-bit cover canonical WAV; anything else
    * the JDK can't hand us as PCM returns None (same NULL-row policy). */
  private[multimodal] def pcmSamples(
      bytes: Array[Byte]): Option[(Array[Double], Int, Int)] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val f = in.getFormat
      val pcmSigned =
        f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val pcmUnsigned =
        f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      val bits = f.getSampleSizeInBits
      if (!((pcmSigned && bits == 16) || (pcmUnsigned && bits == 8))) None
      else {
        val raw = in.readAllBytes()
        val ch = f.getChannels
        val bytesPerFrame = ch * (bits / 8)
        val nFrames = raw.length / bytesPerFrame
        val out = new Array[Double](nFrames)
        var i = 0
        while (i < nFrames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val base = i * bytesPerFrame + c * (bits / 8)
            acc +=
              (if (bits == 8) ((raw(base) & 0xff) - 128) / 128.0
               else {
                 // sign lives in the HIGH byte: shift it unmasked, mask
                 // only the low byte
                 val s =
                   if (f.isBigEndian) (raw(base).toInt << 8) | (raw(base + 1) & 0xff)
                   else (raw(base + 1).toInt << 8) | (raw(base) & 0xff)
                 s / 32768.0
               })
            c += 1
          }
          out(i) = acc / ch
          i += 1
        }
        Some((out, f.getSampleRate.toInt, ch))
      }
    } finally in.close()
  }

  /** Mono samples → fixed 4-dim feature vector for [[batchInfer]]:
    * RMS energy, zero-crossing rate, peak amplitude, DC mean — the
    * classic cheap audio descriptors. NULL samples (decode failures
    * passed through) yield NULL features, like [[pixelFeatures]]. */
  def audioFeatures(df: DataFrame, samplesCol: String = "samples",
                    outCol: String = "features"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val samplesIdx = df.schema.fieldIndex(samplesCol) // see decodeImage
    df.mapPartitions { rows =>
      rows.map { r =>
        val feats = (r.get(samplesIdx) match {
          case null => null
          case a: Array[Double] => a
          case s => s.asInstanceOf[scala.collection.Seq[Double]].toArray
        }) match {
          case null => null
          case s if s.isEmpty => Array(0.0, 0.0, 0.0, 0.0)
          case s =>
            var sumSq = 0.0; var sum = 0.0; var peak = 0.0; var zc = 0
            var i = 0
            while (i < s.length) {
              val v = s(i)
              sumSq += v * v; sum += v
              if (math.abs(v) > peak) peak = math.abs(v)
              if (i > 0 && (s(i - 1) >= 0) != (v >= 0)) zc += 1
              i += 1
            }
            Array(math.sqrt(sumSq / s.length),
              if (s.length > 1) zc.toDouble / (s.length - 1) else 0.0,
              peak, sum / s.length)
        }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** STUB decoder for INTER-FRAME video codecs (H.264/VP9/…) — those
    * really are not in the JDK (images: [[decodeImage]]; PCM audio:
    * [[decodeAudio]]; Motion-JPEG video: [[AviMjpeg.extractFrames]]);
    * emits deterministic per-byte statistics so the distributed
    * plumbing stays real and testable. Runs batched per partition;
    * codec initialization would happen once per partition here (the
    * `// init` point). */
  def decodeStub(df: DataFrame, featureDim: Int = 4): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      // init: a real decoder would open its codec/model ONCE here.
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val feats = (0 until featureDim).map { d =>
          if (bytes == null || bytes.isEmpty) 0.0
          else bytes.iterator.zipWithIndex
            .filter(_._2 % featureDim == d)
            .map(b => (b._1 & 0xff).toDouble).sum / bytes.length
        }.toArray
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** U7: batched model inference — the mapInPandas shape in Scala
    * (reference: MLflow pyfunc batch predict, utils/predict_flow/
    * tasks.py:39-48, and the flooding-detection vision calls). Rows are
    * sliced into `batchSize` groups inside each partition; `model` is
    * invoked once per BATCH over the whole feature matrix (the
    * amortization a model server/vectorized predictor needs), and any
    * per-partition session/codec setup belongs where the iterator is
    * opened. Output = input rows + `outCol` score, order preserved. */
  def batchInfer(df: DataFrame, featuresCol: String, outCol: String,
                 batchSize: Int,
                 model: Seq[Seq[Double]] => Seq[Double]): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, DoubleType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val featuresIdx = df.schema.fieldIndex(featuresCol) // see decodeImage
    df.mapPartitions { rows =>
      // init point: model session / codec opens ONCE per partition here
      rows.grouped(batchSize).flatMap { batch =>
        // a fused upstream typed operator hands the raw Array[Double]
        // it built; a deserialized row hands a Seq; NULL features (a
        // decode failure passed through unfiltered) serve a NULL score
        // instead of an opaque NPE — the model never sees those rows
        val feats = batch.map(_.get(featuresIdx) match {
          case null => null
          case a: Array[Double] => a.toSeq
          case s => s.asInstanceOf[scala.collection.Seq[Double]].toSeq
        })
        val present = feats.filter(_ != null)
        val scores = if (present.isEmpty) Seq.empty else model(present)
        require(scores.length == present.length,
          s"model returned ${scores.length} scores for ${present.length} rows")
        val it = scores.iterator
        batch.lazyZip(feats).map { (r, f) =>
          Row.fromSeq(r.toSeq :+ (if (f == null) null else it.next()))
        }
      }
    }(enc)
  }

  /** REAL nearest-neighbor resample of RAW row-major single-channel
    * frames — the resize member of the decode/extract/resize/sample
    * family. Raw buffers need no codec, so the resample itself is real;
    * an encoded format would decode first at the per-partition init
    * point (same contract as [[batchInfer]]). Emits the input row +
    * `resized` bytes; dimensions come from the given columns, output is
    * targetW×targetH. Frames whose buffer doesn't match width×height
    * are rejected loudly (silent pixel misalignment corrupts every
    * downstream feature). */
  def resizeRaw(df: DataFrame, widthCol: String, heightCol: String,
                targetW: Int, targetH: Int,
                contentCol: String = "content"): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", BinaryType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val contentIdx = df.schema.fieldIndex(contentCol) // see decodeImage
    val wIdx = df.schema.fieldIndex(widthCol)
    val hIdx = df.schema.fieldIndex(heightCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val w = r.get(wIdx).asInstanceOf[Number].intValue()
        val h = r.get(hIdx).asInstanceOf[Number].intValue()
        Row.fromSeq(r.toSeq :+ nearestNeighbor(bytes, w, h, targetW, targetH))
      }
    }(enc)
  }

  /** Static resample kernel: out(x, y) = src(x·w/tw, y·h/th). */
  private[multimodal] def nearestNeighbor(src: Array[Byte], w: Int, h: Int,
                                          tw: Int, th: Int): Array[Byte] = {
    // positive dims checked FIRST: negative pairs multiply to a "valid"
    // product (and 65536² overflows to 0), which would pass a bare
    // length check and scramble pixels silently
    require(w > 0 && h > 0, s"frame dims must be positive, got $w x $h")
    require(src != null && src.length == w.toLong * h,
      s"raw frame is ${if (src == null) "null" else s"${src.length} bytes"}, " +
        s"expected $w x $h = ${w.toLong * h}")
    val out = new Array[Byte](tw * th)
    val sxs = Array.tabulate(tw)(x => (x.toLong * w / tw).toInt)
    var y = 0
    while (y < th) {
      val rowBase = (y.toLong * h / th).toInt * w
      var x = 0
      while (x < tw) {
        out(y * tw + x) = src(rowBase + sxs(x))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Perceptual fingerprint over decoded images ([[decodeImage]]'s
    * output shape): 64-bit dHash with its own 9×8 downsample FUSED
    * into one codegen expression ([[graft.expressions.DHash64]]) —
    * no resized intermediate, no row-encoder pass, and decode
    * failures (NULL pixels) yield NULL hashes instead of throwing. */
  def imageDHash(df: DataFrame, pixelsCol: String = "pixels",
                 widthCol: String = "img_width",
                 heightCol: String = "img_height",
                 outCol: String = "dhash"): DataFrame =
    df.withColumn(outCol, graft.expressions.DHash64.dhash64(
      col(pixelsCol), col(widthCol), col(heightCol)))

  /** IMAGE near-dup pairs by perceptual hash — the dedup family
    * extended to the multimodal column: re-encodes, mild noise and
    * thumbnail copies land within a few dHash bits, so the engine's
    * existing 64-bit Hamming-LSH machinery
    * ([[graft.functions.DedupOps.simhashPairs]]; banding EXACT at
    * maxHamming ≤ 3 by pigeonhole) finds them with the text-SimHash
    * plan — a groupBy per band bucket, nothing pairwise across
    * buckets, no pixel ever compared. NULL hashes (decode failures)
    * are excluded: they cannot be near anything.
    *
    * `collapseIdentical` DEFAULTS TO TRUE here (round 12 — the r11
    * probe showed a sub-cap identical-hash group still expands
    * quadratically under the star cap, and identical fingerprints are
    * the NORM off text: solid frames dHash to 0): identical
    * fingerprints fold to their min-id representative before banding,
    * so the viral bucket never materializes as one aggregation
    * buffer — lossless for survivor selection and clustering
    * (spec-pinned), NOT pair-complete (see
    * [[graft.functions.DedupOps.simhashPairs]]). Pair-complete
    * consumers — video frame-overlap counting
    * ([[videoNearDupPairs]] opts out internally) — must pass
    * `collapseIdentical = false` explicitly. */
  def imageNearDupPairs(df: DataFrame, idCol: String,
                        dhashCol: String = "dhash",
                        maxHamming: Int = 3,
                        starBucketThreshold: Int = DefaultStarBucketThreshold,
                        collapseIdentical: Boolean = true): DataFrame =
    graft.functions.DedupOps.simhashPairs(
      df.filter(col(dhashCol).isNotNull)
        .select(col(idCol),
          lpad(bin(col(dhashCol)), 64, "0").as("simhash")),
      idCol, bits = 64, maxHamming = maxHamming,
      starBucketThreshold = starBucketThreshold,
      collapseIdentical = collapseIdentical)

  /** Perceptual fingerprint over decoded audio ([[decodeAudio]]'s
    * samples column): 64-bit spectrogram hash — band-energy rise/fall
    * bits over a 9×8 (time × frequency) grid, one fused codegen
    * expression ([[graft.expressions.AudioHash64]]). Gain-invariant,
    * resample-tolerant; decode failures (NULL samples) yield NULL. */
  def audioHash(df: DataFrame, samplesCol: String = "samples",
                outCol: String = "ahash"): DataFrame =
    df.withColumn(outCol,
      graft.expressions.AudioHash64.audio_hash64(col(samplesCol)))

  /** AUDIO near-dup pairs by perceptual hash — same machinery as
    * [[imageNearDupPairs]]: the 64-bit Hamming-LSH band join (exact
    * at maxHamming ≤ 3), NULL hashes excluded, same DEFAULT-ON
    * degenerate-fingerprint collapse (silence audio-hashes to 0 the
    * way solid frames dHash to 0 — the regime where the exact path
    * goes quadratic below the star cap). */
  def audioNearDupPairs(df: DataFrame, idCol: String,
                        ahashCol: String = "ahash",
                        maxHamming: Int = 3,
                        starBucketThreshold: Int = DefaultStarBucketThreshold,
                        collapseIdentical: Boolean = true): DataFrame =
    graft.functions.DedupOps.simhashPairs(
      df.filter(col(ahashCol).isNotNull)
        .select(col(idCol),
          lpad(bin(col(ahashCol)), 64, "0").as("simhash")),
      idCol, bits = 64, maxHamming = maxHamming,
      starBucketThreshold = starBucketThreshold,
      collapseIdentical = collapseIdentical)

  /** VIDEO near-dup pairs from per-frame perceptual hashes — the
    * dedup family completed across the multimodal columns: `frames`
    * is the [[graft.multimodal.VideoDecoder.extractFrames]] →
    * [[decodeImage]] → [[imageDHash]] shape (one row per sampled
    * frame, NULL hash on decode failure), frame pairs within
    * `maxHamming` collide through the banded Hamming-LSH join (the
    * text-SimHash plan — no frame ever compared pairwise across
    * buckets), and two videos pair when the MATCHED share of either
    * side's hashed frames reaches `minOverlap`. The share is
    * containment-style (max of the two sides, like the text
    * containment verifier): a short clip wholly embedded in a longer
    * video scores ~1 on its own side — the sub-clip duplication a
    * symmetric ratio systematically misses.
    *
    * Scale shape: frames per video are bounded by the extraction's
    * maxFrames, the frame-pair stage is banded, the video rollup is
    * one count-distinct per video pair, and the per-video frame
    * totals are a broadcastable aggregate. Output: (vid_a, vid_b,
    * matched_a, matched_b, frames_a, frames_b, overlap). */
  def videoNearDupPairs(frames: DataFrame, videoCol: String,
                        frameIdxCol: String, dhashCol: String = "dhash",
                        maxHamming: Int = 3,
                        minOverlap: Double = 0.5,
                        starBucketThreshold: Int = DefaultStarBucketThreshold): DataFrame = {
    // frame key = LENGTH-PREFIXED video id + frame idx: "#"-joining
    // alone is ambiguous when a video id itself contains the delimiter
    // (vid "a#1" frame "2" vs vid "a" frame "1#2"), and a key collision
    // would merge frames ACROSS videos into false overlap. The length
    // prefix pins exactly where the video id ends.
    val vidStr = col(videoCol).cast("string")
    val keyed = frames.filter(col(dhashCol).isNotNull)
      .select(concat(length(vidStr).cast("string"), lit(":"), vidStr,
          lit(":"), col(frameIdxCol).cast("string")).as("__fid"),
        col(videoCol).as("__vid"), col(dhashCol))
    val nFrames = keyed.groupBy(col("__vid"))
      .agg(countDistinct(col("__fid")).as("__nf"))
    // PAIR-COMPLETE consumer: the overlap rollup counts DISTINCT
    // matched frames per video pair, so a member↔member frame pair
    // represented only through its collapse rep would undercount
    // matched_a/matched_b — this is the one consumer that must keep
    // the exact path (explicit opt-out of the collapse default)
    val framePairs = imageNearDupPairs(keyed, "__fid", dhashCol, maxHamming,
      starBucketThreshold, collapseIdentical = false)
    // frame keys → their videos (values from the original column, the
    // length-prefixed key is only a join handle), cross-video pairs
    // only, oriented so fa always belongs to vid_a
    val vmap = keyed.select(col("__fid"), col("__vid"))
    val oriented = framePairs
      .join(vmap.toDF("id_a", "va"), "id_a")
      .join(vmap.toDF("id_b", "vb"), "id_b")
      .filter(col("va") =!= col("vb"))
      .select(
        least(col("va"), col("vb")).as("vid_a"),
        greatest(col("va"), col("vb")).as("vid_b"),
        when(col("va") <= col("vb"), col("id_a")).otherwise(col("id_b"))
          .as("fa"),
        when(col("va") <= col("vb"), col("id_b")).otherwise(col("id_a"))
          .as("fb"))
    oriented.groupBy(col("vid_a"), col("vid_b"))
      .agg(countDistinct(col("fa")).as("matched_a"),
        countDistinct(col("fb")).as("matched_b"))
      .join(broadcast(nFrames.toDF("vid_a", "frames_a")), "vid_a")
      .join(broadcast(nFrames.toDF("vid_b", "frames_b")), "vid_b")
      .withColumn("overlap", round(greatest(
        col("matched_a").cast("double") / col("frames_a"),
        col("matched_b").cast("double") / col("frames_b")), 4))
      .filter(col("overlap") >= minOverlap)
      .select(col("vid_a"), col("vid_b"), col("matched_a"),
        col("matched_b"), col("frames_a"), col("frames_b"), col("overlap"))
  }

  /** Frame-sampling plumbing (video shape): emit every `stride`-th chunk
    * of `chunkBytes` as a frame row — the real version would seek to
    * keyframes; the partition/batch mechanics are identical. */
  def frameSample(df: DataFrame, chunkBytes: Int = 1024,
                  stride: Int = 2): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else bytes.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, idx) => (id, idx.toLong, chunk) }
      }.toDF("media_id", "frame_idx", "frame")
  }
}
