package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pure-JVM Motion-JPEG AVI reader — the VIDEO leg of S22 (reference
  * precedent: camera capture in rj_escritorio/flooding_detection/
  * tasks.py:177-230; some city cameras serve MJPEG streams and archive
  * AVI clips). Format per Microsoft's public "AVI RIFF File Reference":
  *
  *   RIFF('AVI ' LIST('hdrl' 'avih' LIST('strl' 'strh' 'strf' …) …)
  *                LIST('movi' '##dc'/'##db'/LIST('rec ' …) …) ['idx1'])
  *
  * MJPEG is intra-frame only — every '##dc' chunk of the video stream
  * is a complete baseline JPEG — so the JDK's own ImageIO
  * ([[Multimodal.decodeImage]]) decodes frames with ZERO new
  * dependencies. "Video codecs aren't in the JDK" is true only of
  * inter-frame codecs (H.264/VP9/…), which stay out of scope: a
  * non-MJPEG fourcc yields the NULL row, never silently-wrong frames.
  *
  * Robustness follows the Shapefile/Hdf5 precedent: every size field
  * is validated against the bytes actually present BEFORE any slice or
  * allocation (a hostile 4-byte chunk size cannot OOM an executor),
  * and a container truncated mid-'movi' salvages the frames before the
  * cut — at 100 TB there WILL be torn uploads, and one of them must
  * not kill the scan.
  */
object AviMjpeg {

  /** Video-stream header facts: dims from 'avih', fourcc from the
    * 'vids' 'strh', frame count = chunks actually present in 'movi'
    * (the DECLARED dwTotalFrames is hostile input like any other —
    * reported but never trusted for allocation). */
  final case class AviInfo(width: Int, height: Int, declaredFrames: Int,
                           microSecPerFrame: Long, handler: String,
                           streamIndex: Int)

  /** Accepted Motion-JPEG fourcc spellings (public registry values). */
  private val MjpegHandlers = Set("MJPG", "mjpg", "dmb1", "MJPA")

  private def fourCC(b: ByteBuffer): String = {
    val a = new Array[Byte](4); b.get(a)
    new String(a, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Parse an AVI payload. Returns None when the RIFF structure is not
    * an AVI or the video stream is not MJPEG; Some(info, frames) with
    * every '##dc'/'##db' JPEG payload of the video stream otherwise
    * (truncation ⇒ the frames that fit). */
  def parse(bytes: Array[Byte]): Option[(AviInfo, Vector[Array[Byte]])] =
    parseSelected(bytes, 1, Int.MaxValue)
      .map { case (info, _, fs) => (info, fs.map(_._2)) }

  /** [[parse]] with the frame SELECTION pushed into the container walk:
    * only every `stride`-th video chunk (up to `maxFrames` of them) is
    * copied out of the buffer — skipped frames cost neither decode NOR
    * copy (a 64-frame sample of a 10k-frame clip materializes 64
    * payloads, not 10k). The walk still traverses every chunk header so
    * the returned total counts all frames PRESENT. Frames carry their
    * original clip position. */
  def parseSelected(bytes: Array[Byte], stride: Int, maxFrames: Int)
      : Option[(AviInfo, Int, Vector[(Long, Array[Byte])])] = {
    if (bytes == null || bytes.length < 12) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (fourCC(b) != "RIFF") return None
    val riffSize = b.getInt()
    if (riffSize < 4) return None
    if (fourCC(b) != "AVI ") return None
    // walk only bytes that are really there: a hostile riffSize larger
    // than the buffer clamps to the buffer, a smaller one ends early
    val end = math.min(bytes.length.toLong, 8L + riffSize).toInt

    var width, height, declared = 0
    var usPerFrame = 0L
    var handler: Option[String] = None
    var streamIndex = -1
    var strlSeen = 0
    var frameCount = 0
    var taken = 0
    val frames = Vector.newBuilder[(Long, Array[Byte])]

    // Walks [from, to). A LIST whose declared size overruns the bytes
    // present is CLAMPED and entered anyway — that is the torn-upload
    // case, and the frames before the cut must be salvaged. A torn
    // LEAF chunk stops the walk (a partial payload is garbage). All
    // size arithmetic in Long: a hostile 4-byte size must not wrap.
    def walk(from: Int, to: Int, inHdrl: Boolean, inMovi: Boolean): Unit = {
      var pos = from
      var torn = false
      while (!torn && pos + 8 <= to) {
        b.position(pos)
        val cc = fourCC(b)
        val size = b.getInt()
        val body = pos + 8
        if (size < 0) torn = true
        else {
          val bodyEnd = body.toLong + size
          cc match {
            case "LIST" if size >= 4 && body + 4 <= to =>
              b.position(body)
              val listType = fourCC(b)
              val lend = math.min(bodyEnd, to.toLong).toInt
              listType match {
                case "hdrl" => walk(body + 4, lend, inHdrl = true, inMovi = false)
                case "strl" if inHdrl =>
                  val idx = strlSeen; strlSeen += 1
                  // 'strh' is the list's first chunk per spec; scan anyway
                  var p = body + 4
                  var done = false
                  while (!done && p + 8 <= lend) {
                    b.position(p)
                    val scc = fourCC(b)
                    val ssz = b.getInt()
                    if (ssz < 0 || p + 8 + ssz.toLong > lend) done = true
                    else {
                      if (scc == "strh" && ssz >= 8) {
                        b.position(p + 8)
                        val fccType = fourCC(b)
                        val fccHandler = fourCC(b)
                        if (fccType == "vids" && handler.isEmpty) {
                          handler = Some(fccHandler)
                          streamIndex = idx
                        }
                        done = true
                      }
                      p += 8 + ssz + (ssz & 1)
                    }
                  }
                case "movi" => walk(body + 4, lend, inHdrl = false, inMovi = true)
                case "rec " if inMovi =>
                  walk(body + 4, lend, inHdrl = false, inMovi = true)
                case _ => () // INFO etc. — skipped
              }
            case _ if bodyEnd > to => torn = true
            case "avih" if inHdrl && size >= 40 =>
              b.position(body)
              usPerFrame = b.getInt().toLong & 0xffffffffL
              b.position(body + 16); declared = b.getInt()
              b.position(body + 32); width = b.getInt(); height = b.getInt()
            case _ if inMovi && cc(0).isDigit && cc(1).isDigit &&
                (cc.endsWith("dc") || cc.endsWith("db")) =>
              val idx = (cc(0) - '0') * 10 + (cc(1) - '0')
              if (idx == streamIndex && size > 0) {
                if (frameCount % stride == 0 && taken < maxFrames) {
                  frames += ((frameCount.toLong,
                    java.util.Arrays.copyOfRange(bytes, body, body + size)))
                  taken += 1
                }
                frameCount += 1
              }
            case _ => () // idx1, audio '##wb', unknown chunks — skipped
          }
          pos = (bodyEnd + (size & 1)).min(Int.MaxValue.toLong).toInt
        }
      }
    }

    walk(12, end, inHdrl = false, inMovi = false)
    handler match {
      case Some(h) if MjpegHandlers.contains(h) =>
        Some((AviInfo(width, height, declared, usPerFrame, h, streamIndex),
          frameCount, frames.result()))
      case _ => None // no video stream, or a codec we must not fake
    }
  }

  /** MJPEG-AVI frame sampling — [[VideoDecoder.extractFrames]] with the
    * default decoder; kept here so "the AVI op" reads naturally at call
    * sites. */
  def extractFrames(df: DataFrame, contentCol: String = "content",
                    stride: Int = 1, maxFrames: Int = 64): DataFrame =
    VideoDecoder.extractFrames(df, VideoDecoder.MjpegAvi, contentCol,
      stride, maxFrames)
}
