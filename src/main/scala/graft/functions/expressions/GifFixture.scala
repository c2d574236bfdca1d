package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic synthetic GIF generator — the GIF twin of
  * [[JpegFixture]]/[[graft.operators.Multimodal.pixelPngCorpus]],
  * implemented native because LZW entropy coding is not Column byte
  * algebra. Every payload is a REAL GIF stream (header, logical screen
  * descriptor, color table, extensions, LZW-coded image data in
  * sub-blocks, trailer) decodable by any GIF reader (GifSpec
  * differentially decodes them through ImageIO).
  *
  * Source pixels (a pure function of `id`, shared by every variant):
  * a 16×16 plane of md5-derived 6-bit indices into a 64-entry gray
  * ramp — random across ids so non-twin dHashes sit ~32 bits apart.
  *
  * Variants (`mode`):
  *  - `base`      — GIF89a, global color table, a graphic-control and a
  *                  comment extension (the walk must skip them),
  *                  clear-every-60 LZW, 255-byte sub-blocks.
  *  - `reblock`   — the SAME pixels re-encoded: GIF87a, no extensions,
  *                  clear-every-10 LZW, 16-byte sub-blocks — the
  *                  optimizer re-encode; almost no shared bytes,
  *                  identical raster ⇒ dHash Hamming EXACTLY 0.
  *  - `palperm`   — the palette REVERSED and every index remapped: the
  *                  same RGB pixels through a different table (the
  *                  palette-sorting re-encode) ⇒ Hamming 0.
  *  - `interlace` — the same pixels stored in 4-pass interlaced row
  *                  order (the progressive-download re-encode); the
  *                  decoder's de-interlace lands it at Hamming 0.
  *  - `truncated` — `base` torn mid-sub-block (must decode NULL).
  *  - `garbage`   — not a GIF at all.
  *  - `noct`      — color-table flags stripped (neither global nor
  *                  local): a valid-looking container with no palette
  *                  the decoder must cleanly reject (NULL ⇒ the
  *                  byte-level [[BlockHash64]] family keeps covering it).
  */
case class SyntheticGif(child: Expression, mode: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_synthetic_gif"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if GifFixture.Modes.contains(mode) => TypeCheckSuccess
    case LongType => TypeCheckFailure(
      s"$prettyName: unknown mode '$mode' (expected one of ${GifFixture.Modes.mkString(", ")})")
    case dt => TypeCheckFailure(
      s"$prettyName requires a long id argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    GifFixture.build(input.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = s"${GifFixture.getClass.getName.stripSuffix("$")}$$.MODULE$$"
      s"${ev.value} = $impl.build($v, \"$mode\");"
    })

  override protected def withNewChildInternal(newChild: Expression): SyntheticGif =
    copy(child = newChild)
}

object GifFixture {

  val Modes: Set[String] =
    Set("base", "reblock", "palperm", "interlace", "truncated", "garbage", "noct")

  private final val Dim = 16
  private final val MinCode = 6 // 64-entry palette -> 7-bit initial codes

  /** The shared 6-bit index plane (row-major). */
  private[expressions] def indices(id: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val px = new Array[Int](Dim * Dim)
    var y = 0
    while (y < Dim) {
      val h = md.digest(s"$id|g$y".getBytes("UTF-8"))
      var x = 0
      while (x < Dim) { px(y * Dim + x) = h(x) & 0x3f; x += 1 }
      y += 1
    }
    px
  }

  /** 64-entry gray ramp; `reversed` permutes the table (indices remapped
    * to keep the same RGB raster).
    */
  private def palette(reversed: Boolean): Array[Byte] = {
    val p = new Array[Byte](3 * 64)
    var i = 0
    while (i < 64) {
      val slot = if (reversed) 63 - i else i
      val v = (i * 255 / 63).toByte
      p(3 * slot) = v; p(3 * slot + 1) = v; p(3 * slot + 2) = v
      i += 1
    }
    p
  }

  /** GIF-variant LZW encode: all-literal codes with a clear every
    * `resetEvery` (keeps the code width fixed at MinCode+1 — the decoder
    * tracks dictionary growth identically and never sees a width bump).
    */
  private def lzwEncode(idx: Array[Int], resetEvery: Int): Array[Byte] = {
    require(resetEvery >= 1 && resetEvery <= 60, "width must stay at MinCode+1")
    val clear = 1 << MinCode
    val eoi = clear + 1
    val width = MinCode + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += width
      while (accBits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        accBits -= 8
      }
    }
    put(clear)
    var sinceClear = 0
    idx.foreach { v =>
      if (sinceClear == resetEvery) { put(clear); sinceClear = 0 }
      put(v)
      sinceClear += 1
    }
    put(eoi)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  private def subBlocks(data: Array[Byte], blockLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      val n = math.min(blockLen, data.length - i)
      out.write(n)
      out.write(data, i, n)
      i += n
    }
    out.write(0)
    out.toByteArray
  }

  private def interlaceRows(idx: Array[Int]): Array[Int] = {
    val out = new Array[Int](idx.length)
    var o = 0
    Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
      var y = start
      while (y < Dim) {
        System.arraycopy(idx, y * Dim, out, o * Dim, Dim)
        o += 1
        y += step
      }
    }
    out
  }

  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def gif(
      v89: Boolean, withExts: Boolean, pal: Array[Byte], withGct: Boolean,
      interlaced: Boolean, idx: Array[Int], resetEvery: Int, blockLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write((if (v89) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    le16(out, Dim); le16(out, Dim)
    out.write(if (withGct) 0x80 | (MinCode - 1) | 0x20 else 0x00) // GCT flag + size 2^6
    out.write(0); out.write(0) // bg index, aspect
    if (withGct) out.write(pal)
    if (withExts) {
      // graphic control extension + a comment extension: the walk skips both
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); le16(out, 0); out.write(0); out.write(0)
      out.write(0x21); out.write(0xfe)
      val c = "graft-fixture".getBytes("US-ASCII")
      out.write(c.length); out.write(c); out.write(0)
    }
    out.write(0x2c)
    le16(out, 0); le16(out, 0); le16(out, Dim); le16(out, Dim)
    out.write(if (interlaced) 0x40 else 0x00) // no LCT
    out.write(MinCode)
    out.write(subBlocks(lzwEncode(idx, resetEvery), blockLen))
    out.write(0x3b)
    out.toByteArray
  }

  def build(id: Long, mode: String): Array[Byte] = mode match {
    case "base" =>
      gif(v89 = true, withExts = true, palette(false), withGct = true,
        interlaced = false, indices(id), resetEvery = 60, blockLen = 255)
    case "reblock" =>
      gif(v89 = false, withExts = false, palette(false), withGct = true,
        interlaced = false, indices(id), resetEvery = 10, blockLen = 16)
    case "palperm" =>
      gif(v89 = true, withExts = true, palette(true), withGct = true,
        interlaced = false, indices(id).map(63 - _), resetEvery = 60, blockLen = 255)
    case "interlace" =>
      gif(v89 = true, withExts = false, palette(false), withGct = true,
        interlaced = true, interlaceRows(indices(id)), resetEvery = 60, blockLen = 255)
    case "truncated" =>
      val full = build(id, "base")
      java.util.Arrays.copyOf(full, full.length * 2 / 3)
    case "garbage" =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < 16) { out.write(md.digest(s"$id|gg$i".getBytes("UTF-8"))); i += 1 }
      out.toByteArray
    case "noct" =>
      gif(v89 = true, withExts = false, palette(false), withGct = false,
        interlaced = false, indices(id), resetEvery = 60, blockLen = 255)
    case other => throw new IllegalArgumentException(s"unknown SyntheticGif mode '$other'")
  }
}
