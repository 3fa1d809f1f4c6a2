package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pluggable clip→frames decoder — the inter-frame-codec plug point.
  *
  * The sandbox ships exactly one REAL implementation, [[VideoDecoder.MjpegAvi]]
  * (pure-JVM Motion-JPEG AVI via [[AviMjpeg]]; intra-frame only).
  * H.264/VP9 genuinely cannot be decoded with the JDK alone (the
  * reference shells out to OpenCV for its camera feeds,
  * rj_escritorio/flooding_detection/tasks.py:177-230); rather than a
  * silent stub, a production deployment implements THIS trait over
  * ffmpeg/JavaCV and every downstream stage — sampling, schema,
  * null-row failure policy, [[Multimodal.decodeImage]],
  * [[Multimodal.resize]], model scoring — runs unchanged. Mirrors how
  * [[graft.connectors.VisionClient]] injects its HTTP transport.
  */
trait VideoDecoder extends Serializable {

  /** Codec/container scope, for diagnostics. */
  def name: String

  /** Total frames PRESENT in the container plus the SELECTED frames as
    * (original clip position, image payload decodable by
    * [[Multimodal.decodeImage]]). Selection — every `stride`-th frame,
    * at most `maxFrames` — happens INSIDE the decoder so skipped frames
    * are never materialized (for MJPEG that means never even copied out
    * of the container buffer; for an inter-frame codec the decoder
    * still has to reference-decode past frames, but re-encodes only the
    * selected ones). Must return None — never throw — for bytes outside
    * this decoder's format/codec: at 100 TB hostile and torn payloads
    * are routine input, not exceptions. */
  def decode(bytes: Array[Byte], stride: Int, maxFrames: Int)
      : Option[VideoDecoder.Clip]
}

object VideoDecoder {

  /** `frameCount` counts every frame present; `frames` holds only the
    * selected (position, payload) pairs. */
  final case class Clip(frameCount: Int, frames: Vector[(Long, Array[Byte])])

  /** The default and only in-sandbox decoder: Motion-JPEG in AVI. */
  object MjpegAvi extends VideoDecoder {
    val name = "mjpeg-avi"
    def decode(bytes: Array[Byte], stride: Int, maxFrames: Int): Option[Clip] =
      AviMjpeg.parseSelected(bytes, stride, maxFrames)
        .map { case (_, n, fs) => Clip(n, fs) }
  }

  /** DataFrame op: one row per SAMPLED video frame — input row +
    * `frame_idx` (position in the clip), `frame` (the image bytes,
    * [[Multimodal.decodeImage]]'s input) and `vid_frames` (frames
    * present in the container). Sampling takes every `stride`-th frame
    * up to `maxFrames` — the keyframe-subsample a vision model wants —
    * and the selection is pushed into the decoder, so skipped frames
    * cost neither decode nor copy.
    *
    * Failure policy (spec-pinned, same as every decoder here): a
    * corrupt or out-of-scope payload yields ONE row with null
    * frame_idx/frame — countable by a plain agg, never a task failure.
    */
  def extractFrames(df: DataFrame, decoder: VideoDecoder = MjpegAvi,
                    contentCol: String = "content",
                    stride: Int = 1, maxFrames: Int = 64): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", LongType),
      StructField("frame", BinaryType),
      StructField("vid_frames", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val contentIdx = df.schema.fieldIndex(contentCol) // see decodeImage
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val clip =
          try decoder.decode(bytes, stride, maxFrames)
          catch { case scala.util.control.NonFatal(_) => None }
        clip match {
          case Some(c) if c.frames.nonEmpty =>
            c.frames.iterator.map { case (i, img) =>
              Row.fromSeq(r.toSeq ++ Seq(i, img, c.frameCount))
            }
          case _ =>
            Iterator(Row.fromSeq(r.toSeq ++ Seq(null, null, null)))
        }
      }
    }(enc)
  }
}
