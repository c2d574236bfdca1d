package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** PIXEL-LEVEL perceptual hash for PNG payloads: inflate IDAT
  * (deterministic zlib — RFC 1950/1951 inflate of a valid stream is
  * byte-exact on every implementation, unlike lossy codecs), undo the
  * per-scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6), reduce
  * to integer luma, box-downsample to a 9×8 grid with integer bounds
  * `[g·dim/cells, (g+1)·dim/cells)`, and emit the 64-bit dHash — bit
  * `r·8+c` set iff `cell[r][c+1] > cell[r][c]` (gradient hashing;
  * Krawetz's dHash construction). Returns NULL for anything that is not a
  * cleanly-decodable PNG: wrong signature, truncated chunk or IDAT
  * stream, bad filter code, interlaced or non-8-bit images, dimensions
  * outside `[9..MaxDim] × [8..MaxDim]` or above [[PngPixelHash.MaxPixels]]
  * — never throws (ParserFuzzSpec).
  *
  * WHY pixels, not bytes: [[BlockHash64]] fingerprints the COMPRESSED
  * stream, so a re-encoded image — different zlib framing, different
  * filter choices, same pixels; the common duplicate in a crawled corpus —
  * hashes differently and the byte-level near-dup provably misses it.
  * dHash over decoded pixels is invariant to the encoding entirely:
  * re-encode twins land at Hamming 0. Chunk CRCs and the zlib Adler32
  * are deliberately NOT validated (inflation stops at the expected
  * output size): corrupted trailers change no pixel, and a dedup
  * fingerprint wants content identity, not container integrity.
  *
  * Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette,
  * PLTE required), 4 (gray+alpha), 6 (RGBA); luma = (299R+587G+114B)/1000
  * integer, alpha ignored. Non-PNG / undecodable media keep the
  * byte-level [[BlockHash64]] family as their fingerprint.
  *
  * Scale: one codegen'd projection, payload never shuffles — only the
  * 8-byte hash flows into the banded pair machinery
  * ([[graft.operators.Dedup.hammingPairs64]]).
  */
case class PngPixelHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_pixel_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PngPixelHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("pngPixelHashImpl", PngPixelHash,
        PngPixelHash.getClass.getName)
      val tmp = ctx.freshName("pxh")
      s"""
        |java.lang.Long $tmp = $impl.hash($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp.longValue(); }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PngPixelHash =
    copy(child = newChild)
}

object PngPixelHash {

  /** Reject absurd header dimensions before allocating anything. */
  val MaxDim = 8192
  val MaxPixels: Int = 1 << 22 // 4M pixels; raw buffer ≤ ~16 MB transient

  private[expressions] final class Gray(val px: Array[Int], val w: Int, val h: Int)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  def hash(b: Array[Byte]): java.lang.Long =
    try {
      val g = decodeGray(b)
      if (g == null) null else java.lang.Long.valueOf(dhash(g.px, g.w, g.h))
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Full decode to integer luma, or null on anything unclean. */
  private[expressions] def decodeGray(b: Array[Byte]): Gray = {
    if (b == null || b.length < 45) return null // sig + IHDR + minimal IDAT
    var i = 0
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    while (i < 8) { if ((b(i) & 0xff) != sig(i)) return null; i += 1 }
    var pos = 8
    var w = 0; var h = 0; var color = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var seenIhdr = false
    var done = false
    while (!done && pos + 8 <= b.length) {
      val len = be32(b, pos)
      if (len > Int.MaxValue - 12L) return null
      val l = len.toInt
      if (pos + 8 + l > b.length) return null // truncated chunk data (incl. torn IDAT)
      if (!seenIhdr) {
        if (!tag(b, pos + 4, "IHDR") || l != 13) return null // IHDR must come first
        w = be32(b, pos + 8).toInt
        h = be32(b, pos + 12).toInt
        val depth = b(pos + 16) & 0xff
        color = b(pos + 17) & 0xff
        val comp = b(pos + 18) & 0xff
        val filt = b(pos + 19) & 0xff
        val inter = b(pos + 20) & 0xff
        if (depth != 8 || comp != 0 || filt != 0 || inter != 0) return null
        if (color != 0 && color != 2 && color != 3 && color != 4 && color != 6) return null
        // dHash needs a 9×8 grid; smaller images keep the byte fingerprint
        if (w < 9 || w > MaxDim || h < 8 || h > MaxDim) return null
        if (w.toLong * h > MaxPixels) return null
        seenIhdr = true
      } else if (tag(b, pos + 4, "PLTE")) {
        if (l % 3 != 0 || l == 0 || l > 768) return null
        palette = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + l)
      } else if (tag(b, pos + 4, "IDAT")) {
        idat.write(b, pos + 8, l)
      } else if (tag(b, pos + 4, "IEND")) {
        done = true
      }
      pos += 8 + l + 4 // skip CRC (not validated — content identity, not integrity)
    }
    if (!seenIhdr || idat.size() == 0) return null
    if (color == 3 && palette == null) return null
    val ch = color match { case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case _ => 4 }
    val stride = w * ch
    val expected = h * (1 + stride)
    val raw = new Array[Byte](expected)
    // validate the 2-byte zlib header ourselves and inflate RAW (nowrap):
    // java's wrapped Inflater validates the Adler32 trailer inside the
    // same inflate() call that produces the final bytes, so a stream with
    // a corrupt/absent trailer would throw AFTER every pixel was already
    // decoded — content identity must not depend on trailer integrity
    val z = idat.toByteArray
    if (z.length < 3) return null
    val cmf = z(0) & 0xff; val flg = z(1) & 0xff
    if ((cmf & 0x0f) != 8 || ((cmf << 8) | flg) % 31 != 0) return null
    if ((flg & 0x20) != 0) return null // preset dictionary: never in PNG
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(z, 2, z.length - 2)
      var got = 0
      while (got < expected) {
        val n = try inf.inflate(raw, got, expected - got)
        catch { case _: java.util.zip.DataFormatException => return null }
        if (n == 0) return null // truncated/garbage deflate stream
        got += n
      }
    } finally inf.end()
    // undo per-scanline filters in place (RFC 2083 §6.2-6.6); byte
    // arithmetic is mod-256 by construction
    val bpp = ch
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      val row = y * (1 + stride) + 1
      val prev = (y - 1) * (1 + stride) + 1
      f match {
        case 0 => ()
        case 1 =>
          var x = bpp
          while (x < stride) {
            raw(row + x) = (raw(row + x) + raw(row + x - bpp)).toByte; x += 1
          }
        case 2 =>
          if (y > 0) {
            var x = 0
            while (x < stride) { raw(row + x) = (raw(row + x) + raw(prev + x)).toByte; x += 1 }
          }
        case 3 =>
          var x = 0
          while (x < stride) {
            val a = if (x >= bpp) raw(row + x - bpp) & 0xff else 0
            val u = if (y > 0) raw(prev + x) & 0xff else 0
            raw(row + x) = (raw(row + x) + ((a + u) >> 1)).toByte; x += 1
          }
        case 4 =>
          var x = 0
          while (x < stride) {
            val a = if (x >= bpp) raw(row + x - bpp) & 0xff else 0
            val u = if (y > 0) raw(prev + x) & 0xff else 0
            val c = if (x >= bpp && y > 0) raw(prev + x - bpp) & 0xff else 0
            raw(row + x) = (raw(row + x) + paeth(a, u, c)).toByte; x += 1
          }
        case _ => return null
      }
      y += 1
    }
    // integer luma plane
    val px = new Array[Int](w * h)
    var p = 0
    y = 0
    while (y < h) {
      val row = y * (1 + stride) + 1
      var x = 0
      while (x < w) {
        px(p) = color match {
          case 0 => raw(row + x) & 0xff
          case 4 => raw(row + x * 2) & 0xff
          case 3 =>
            val idx = (raw(row + x) & 0xff) * 3
            if (idx + 2 >= palette.length) return null // index past PLTE
            luma(palette(idx) & 0xff, palette(idx + 1) & 0xff, palette(idx + 2) & 0xff)
          case _ =>
            val o = row + x * ch
            luma(raw(o) & 0xff, raw(o + 1) & 0xff, raw(o + 2) & 0xff)
        }
        p += 1; x += 1
      }
      y += 1
    }
    new Gray(px, w, h)
  }

  private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  private def paeth(a: Int, u: Int, c: Int): Int = {
    val pp = a + u - c
    val pa = math.abs(pp - a); val pb = math.abs(pp - u); val pc = math.abs(pp - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c
  }

  /** 9×8 integer box means → 64 gradient bits. Requires w ≥ 9, h ≥ 8
    * (enforced at decode).
    */
  private[expressions] def dhash(px: Array[Int], w: Int, h: Int): Long = {
    val cells = new Array[Long](72)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += px(y * w + x); n += 1; x += 1 }
          y += 1
        }
        cells(gy * 9 + gx) = if (n == 0) 0L else s / n
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c + 1) > cells(r * 9 + c)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }
}
