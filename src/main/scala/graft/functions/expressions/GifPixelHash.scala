package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** PIXEL-LEVEL perceptual hash for GIF payloads — the third leg of the
  * image content-identity family ([[PngPixelHash]], [[JpegPixelHash]]):
  * parse the GIF87a/89a container (logical screen descriptor, global or
  * local color table, extension blocks skipped), LZW-decode the FIRST
  * image's index stream (variable code width 3..12 bits LSB-first,
  * clear/EOI handling, the deferred-clear dictionary rule), undo
  * interlacing when flagged, map indices through the palette to integer
  * luma `(299R+587G+114B)/1000`, and emit the same 9×8 box-downsampled
  * 64-bit dHash as the PNG/JPEG decoders ([[PngPixelHash.dhash]]).
  *
  * WHY pixels, not bytes: GIF's LZW stream is encoder-dependent — the
  * same pixels re-encoded with different clear-code cadence, sub-block
  * sizes, a permuted palette, or interlaced row order shares almost no
  * bytes with the original, so the byte-level [[BlockHash64]] provably
  * misses the re-encode duplicate; the decoded-pixel dHash lands it at
  * Hamming 0. First frame only: an animation's identity for dedup
  * purposes is its poster frame, and decoding one frame bounds the work.
  *
  * Returns NULL for anything not cleanly decodable: wrong signature, no
  * color table, dimensions outside `[9..MaxDim] × [8..MaxDim]`, torn
  * sub-blocks, LZW codes past the dictionary, or an index stream shorter
  * than the raster — never throws (GifSpec fuzzes).
  *
  * Scale: one codegen'd projection, payload never shuffles — only the
  * 8-byte hash flows into the banded pair machinery.
  */
case class GifPixelHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_pixel_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    GifPixelHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("gifPixelHashImpl", GifPixelHash,
        GifPixelHash.getClass.getName)
      val tmp = ctx.freshName("gfh")
      s"""
        |java.lang.Long $tmp = $impl.hash($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp.longValue(); }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GifPixelHash =
    copy(child = newChild)
}

object GifPixelHash {

  val MaxDim = 8192
  val MaxPixels: Int = 1 << 22

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  def hash(b: Array[Byte]): java.lang.Long =
    try {
      val g = decodeGray(b)
      if (g == null) null
      else java.lang.Long.valueOf(PngPixelHash.dhash(g.px, g.w, g.h))
    } catch { case scala.util.control.NonFatal(_) => null }

  /** First frame decoded to integer luma, or null on anything unclean. */
  private[expressions] def decodeGray(b: Array[Byte]): PngPixelHash.Gray = {
    if (b == null || b.length < 13) return null
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return null
    // logical screen descriptor
    val packed = b(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 7) + 1))
      if (pos + n > b.length) return null
      gct = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
    }
    // block walk to the first image descriptor
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          var len = if (pos < b.length) b(pos) & 0xff else return null
          while (len != 0) {
            pos += 1 + len
            if (pos >= b.length) return null
            len = b(pos) & 0xff
          }
          pos += 1
        case 0x2c => // image descriptor
          if (pos + 10 > b.length) return null
          val w = le16(b, pos + 5)
          val h = le16(b, pos + 7)
          val ipacked = b(pos + 9) & 0xff
          val interlaced = (ipacked & 0x40) != 0
          pos += 10
          var pal = gct
          if ((ipacked & 0x80) != 0) {
            val n = 3 * (1 << ((ipacked & 7) + 1))
            if (pos + n > b.length) return null
            pal = java.util.Arrays.copyOfRange(b, pos, pos + n)
            pos += n
          }
          if (pal == null) return null
          if (w < 9 || w > MaxDim || h < 8 || h > MaxDim) return null
          if (w.toLong * h > MaxPixels) return null
          if (pos >= b.length) return null
          val minCode = b(pos) & 0xff
          pos += 1
          if (minCode < 1 || minCode > 11) return null
          // gather the LZW stream from the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var len = if (pos < b.length) b(pos) & 0xff else return null
          while (len != 0) {
            if (pos + 1 + len > b.length) return null // torn sub-block
            data.write(b, pos + 1, len)
            pos += 1 + len
            if (pos >= b.length) return null
            len = b(pos) & 0xff
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h)
          if (idx == null) return null
          // palette -> integer luma; stored rows land at their display
          // positions (interlace passes 8/8/4/2 when flagged)
          val colors = pal.length / 3
          val px = new Array[Int](w * h)
          val disp = new Array[Int](h)
          if (interlaced) {
            var out = 0
            Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
              var y = start
              while (y < h) { disp(out) = y; out += 1; y += step }
            }
          } else {
            var y = 0
            while (y < h) { disp(y) = y; y += 1 }
          }
          var sy = 0
          while (sy < h) {
            val dy = disp(sy)
            var x = 0
            while (x < w) {
              val ci = idx(sy * w + x) & 0xff
              if (ci >= colors) return null
              val r = pal(3 * ci) & 0xff
              val gch = pal(3 * ci + 1) & 0xff
              val bch = pal(3 * ci + 2) & 0xff
              px(dy * w + x) = (299 * r + 587 * gch + 114 * bch) / 1000
              x += 1
            }
            sy += 1
          }
          return new PngPixelHash.Gray(px, w, h)
        case 0x3b => return null // trailer before any image
        case _ => return null
      }
    }
    null
  }

  /** GIF-variant LZW decode of exactly `need` indices; null on any
    * malformed stream (bad code, dictionary overflow, short output).
    */
  private def lzwDecode(d: Array[Byte], minCode: Int, need: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](need)
    var outN = 0
    var next = eoi + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L
    var accBits = 0
    var i = 0
    while (true) {
      // pull one code
      while (accBits < width) {
        if (i >= d.length) return null // stream ended without EOI/raster
        acc |= (d(i) & 0xffL) << accBits
        accBits += 8
        i += 1
      }
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      accBits -= width
      if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return if (outN == need) out else null
      } else if (prev == -1) {
        if (code >= clear) return null
        if (outN >= need) return if (outN == need) out else null
        out(outN) = code.toByte; outN += 1
        prev = code
      } else {
        if (code > next || code == clear || code == eoi) return null
        var sp = 0
        var cur = if (code == next) prev else code
        val appendFirst = code == next
        while (cur >= clear + 2) { // walk the chain (codes >= eoi+1 are composites)
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
          if (sp > 4096) return null
        }
        val first = cur.toByte
        // emit: first literal, reversed chain, (+ first again for the KwK case)
        val emitLen = sp + 1 + (if (appendFirst) 1 else 0)
        if (outN + emitLen > need) return null
        out(outN) = first; outN += 1
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        if (appendFirst) { out(outN) = first; outN += 1 }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
        if (outN == need) {
          // raster complete: accept with or without a trailing EOI
          return out
        }
      }
    }
    null
  }
}
