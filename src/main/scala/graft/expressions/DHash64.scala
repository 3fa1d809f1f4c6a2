package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit difference hash (dHash) of a grayscale image — the standard
  * perceptual fingerprint for IMAGE near-dup dedup (re-encodes, mild
  * crops/noise, thumbnail copies hash within a few bits; unrelated
  * images differ in ~32): the image is sampled to a 9×8 grid and each
  * bit records whether a pixel is darker than its right neighbour, so
  * the hash follows luminance STRUCTURE and ignores absolute levels.
  *
  * One fused codegen expression over (pixels, width, height) — the
  * 9×8 downsample happens INSIDE the kernel (same nearest-neighbour
  * index formula as [[graft.multimodal.Multimodal.resizeRaw]]), so
  * the hash projection stays in whole-stage codegen with no
  * intermediate resized column and no row-encoder pass, and NULL
  * pixels (upstream decode failures) null-propagate instead of
  * throwing. Downstream the hash rides the engine's existing 64-bit
  * Hamming-LSH machinery ([[graft.functions.DedupOps.simhashPairs]]
  * via `lpad(bin(hash), 64, '0')` — banding exact at Hamming ≤ 3).
  */
object DHash64 {
  val GridW = 9
  val GridH = 8

  /** Row-major 8-bit grayscale (w×h) → 64-bit dHash. Bit (y*8 + x),
    * MSB first, is 1 when grid(y, x) < grid(y, x+1). */
  def compute(px: Array[Byte], w: Int, h: Int): Long = {
    require(w > 0 && h > 0, s"image dims must be positive, got $w x $h")
    require(px != null && px.length == w.toLong * h,
      s"pixel buffer is ${if (px == null) "null" else s"${px.length} bytes"}, " +
        s"expected $w x $h = ${w.toLong * h}")
    // nearest-neighbour sample positions (resizeRaw's formula)
    val sxs = new Array[Int](GridW)
    var x = 0
    while (x < GridW) { sxs(x) = (x.toLong * w / GridW).toInt; x += 1 }
    var hash = 0L
    var y = 0
    while (y < GridH) {
      val rowBase = (y.toLong * h / GridH).toInt * w
      var left = px(rowBase + sxs(0)) & 0xff
      x = 1
      while (x < GridW) {
        val right = px(rowBase + sxs(x)) & 0xff
        hash = (hash << 1) | (if (left < right) 1L else 0L)
        left = right
        x += 1
      }
      y += 1
    }
    hash
  }

  def dhash64(pixels: Column, width: Column, height: Column): Column =
    Bridge.column(DHash64Expr(Bridge.expression(pixels),
      Bridge.expression(width), Bridge.expression(height)))
}

case class DHash64Expr(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override def nullSafeEval(px: Any, w: Any, h: Any): Any =
    DHash64.compute(px.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, w, h) =>
      s"${ev.value} = graft.expressions.DHash64.compute($px, $w, $h);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): DHash64Expr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
