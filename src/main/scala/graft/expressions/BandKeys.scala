package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash-LSH band keys for ONE document in ONE fused native pass —
  * the streaming scan-projection kernel behind
  * [[graft.functions.DedupOps.bandKeysPerRow]].
  *
  * Value-identical to the column encoding it replaces (`numHashes`
  * interpreted `transform` lanes of `hex_prefix_to_long(md5("<seed>|" +
  * shingle), 15)` min-folded per lane, then `md5(concat_ws("|",
  * lanes))` per band — lanes rendered as decimal longs), and therefore
  * to the BATCH band path ([[graft.functions.DedupOps.lshBands]] over
  * [[graft.functions.DedupOps.minhashSignature]]), which the
  * streaming↔batch interop property test pins. Shingling matches
  * [[Shingles]]: split-on-single-space, empty words preserved,
  * L−n+1 windows; a document shorter than one shingle yields an EMPTY
  * array.
  *
  * Why native: the HOF encoding ran `numHashes` interpreted transform
  * passes over the shingle array per row — per element, an expression
  * tree of concat_ws→md5→hex-parse with UTF8String boxing at every
  * step. Here the text splits once, each shingle's bytes are built
  * once and hashed `numHashes` times through one thread-local
  * MessageDigest, and the 60-bit lane prefix is read straight off the
  * digest bytes (no hex-string round trip). Same md5 count, a fraction
  * of the interpretation overhead — and the whole projection stays
  * inside whole-stage codegen.
  */
case class BandKeys(child: Expression, numHashes: Int, rowsPerBand: Int,
                    shingleSize: Int) extends UnaryExpression {
  // numHashes need NOT divide evenly: numBands floor-divides and spare
  // lanes go unused — exactly the batch path's (lshBands) acceptance
  require(numHashes >= 1 && rowsPerBand >= 1,
    s"numHashes $numHashes and rowsPerBand $rowsPerBand must be positive")
  require(shingleSize >= 1, s"shingle size $shingleSize must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "band_keys"

  override protected def nullSafeEval(input: Any): Any =
    BandKeys.compute(input.asInstanceOf[UTF8String], numHashes, rowsPerBand,
      shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BandKeys.compute($c, $numHashes, " +
        s"$rowsPerBand, $shingleSize);")

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

object BandKeys {
  private val Space = UTF8String.fromString(" ")
  private val HexDigits = "0123456789abcdef".getBytes(StandardCharsets.US_ASCII)
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // "<seed>|" prefixes, cached per numHashes — not rebuilt per ROW
  private val seedPrefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def seedPrefixes(numHashes: Int): Array[Array[Byte]] =
    seedPrefixCache.computeIfAbsent(numHashes, n =>
      Array.tabulate(n)(s => (s.toString + "|").getBytes(StandardCharsets.UTF_8)))

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, numHashes: Int, rowsPerBand: Int,
              shingleSize: Int): ArrayData = {
    val words = text.split(Space, -1)
    val count = words.length - shingleSize + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val md = md5Local.get()
    // "<seed>|" byte prefixes — concat_ws("|", seed, shingle) parity
    val seedPrefix = seedPrefixes(numHashes)
    val lanes = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < count) {
      var s = words(i)
      var j = 1
      while (j < shingleSize) {
        s = UTF8String.concat(s, Space, words(i + j))
        j += 1
      }
      val shingleBytes = s.getBytes
      var seed = 0
      while (seed < numHashes) {
        md.reset()
        md.update(seedPrefix(seed))
        md.update(shingleBytes)
        val d = md.digest()
        // first 15 hex chars of the digest as a long = 7 full bytes
        // plus the high nibble of byte 7 (hex_prefix_to_long parity)
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        v = (v << 4) | ((d(7) >> 4) & 0xfL)
        if (v < lanes(seed)) lanes(seed) = v
        seed += 1
      }
      i += 1
    }
    val numBands = numHashes / rowsPerBand
    val out = new Array[Any](numBands)
    var band = 0
    while (band < numBands) {
      // md5(concat_ws("|", lane longs)) — lanes as DECIMAL strings
      val sb = new java.lang.StringBuilder(rowsPerBand * 20)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append('|')
        sb.append(lanes(band * rowsPerBand + r))
        r += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      val hex = new Array[Byte](32)
      var bi = 0
      while (bi < 16) {
        hex(bi * 2) = HexDigits((d(bi) >> 4) & 0xf)
        hex(bi * 2 + 1) = HexDigits(d(bi) & 0xf)
        bi += 1
      }
      out(band) = UTF8String.fromBytes(hex)
      band += 1
    }
    new GenericArrayData(out)
  }

  def band_keys(c: Column, numHashes: Int, rowsPerBand: Int,
                shingleSize: Int): Column =
    Bridge.column(BandKeys(Bridge.expression(c), numHashes, rowsPerBand,
      shingleSize))
}
