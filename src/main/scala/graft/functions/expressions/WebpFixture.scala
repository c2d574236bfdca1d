package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic synthetic WebP-lossless (VP8L) generator — the WebP twin
  * of [[GifFixture]]/[[JpegFixture]], implemented native because prefix
  * coding + transforms are not Column byte algebra. Every payload is a
  * REAL RIFF/WEBP container holding a spec-complete VP8L bitstream
  * (LSB-first bit packing, canonical prefix codes in both simple and
  * normal form with the code-length-code machinery, forward transforms,
  * LZ77 with the two-dimensional distance map, color cache) that
  * [[WebpPixelHash]] fully decodes; WebpSpec round-trips every variant
  * pixel-exactly.
  *
  * Source pixels (a pure function of `id`, SAME raster as the GIF
  * fixture construction): a 16×16 plane of md5-derived 6-bit gray
  * levels.
  *
  * Variants (`mode`) — all of the same raster, so every pair lands at
  * dHash Hamming EXACTLY 0:
  *  - `base`     — plain literals, normal prefix codes, no transform.
  *  - `subg`     — SUBTRACT_GREEN re-encode: gray collapses red/blue to
  *                 single-symbol (0-bit) codes — almost no shared bytes.
  *  - `pred`     — PREDICTOR re-encode (8×8 blocks, modes L/T/Select/
  *                 avg(L,T) — the "different predictor set" pass).
  *  - `pal`      — COLOR_INDEXING re-encode: 64-entry delta-coded
  *                 palette, indices in the green channel.
  *  - `cache`    — color cache (4 bits) + LZ77 backrefs (runs against
  *                 dist 1 and dist w, alternating the plane-code and the
  *                 direct `120+d` encodings), inside a VP8X extended
  *                 container with a metadata chunk the walk must skip.
  *  - `meta`     — two meta-prefix groups (left/right half), exercising
  *                 the entropy-image machinery.
  *  - `pal4`     — 4-level quantized raster through a bundled palette
  *                 (2-bit sub-pixels packed 4-per-byte).
  *  - `pal4lit`  — the SAME quantized raster as plain literals — the
  *                 bundling twin (Hamming 0 vs `pal4`, NOT vs `base`).
  *  - `truncated`— `base` torn mid-bitstream (must decode NULL).
  *  - `garbage`  — not RIFF at all (NULL).
  *  - `lossy`    — a valid container holding only a lossy `VP8 ` chunk:
  *                 documented-unsupported, decodes NULL ⇒ the byte-level
  *                 [[BlockHash64]] family keeps covering it.
  */
case class SyntheticWebp(child: Expression, mode: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_synthetic_webp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if WebpFixture.Modes.contains(mode) => TypeCheckSuccess
    case LongType => TypeCheckFailure(
      s"$prettyName: unknown mode '$mode' (expected one of ${WebpFixture.Modes.mkString(", ")})")
    case dt => TypeCheckFailure(
      s"$prettyName requires a long id argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WebpFixture.build(input.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = s"${WebpFixture.getClass.getName.stripSuffix("$")}$$.MODULE$$"
      s"${ev.value} = $impl.build($v, \"$mode\");"
    })

  override protected def withNewChildInternal(newChild: Expression): SyntheticWebp =
    copy(child = newChild)
}

object WebpFixture {

  val Modes: Set[String] = Set(
    "base", "subg", "pred", "pal", "cache", "meta", "pal4", "pal4lit",
    "truncated", "garbage", "lossy", "vp8q8", "vp8q25",
    "anim", "animlossy", "animtrunc")

  private final val Dim = 16

  /** The shared 6-bit gray plane (row-major) — same construction as the
    * GIF fixture so twin math stays uniform across formats.
    */
  private[expressions] def grays(id: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val px = new Array[Int](Dim * Dim)
    var y = 0
    while (y < Dim) {
      val h = md.digest(s"$id|w$y".getBytes("UTF-8"))
      var x = 0
      while (x < Dim) { px(y * Dim + x) = h(x) & 0x3f; x += 1 }
      y += 1
    }
    px
  }

  /** ARGB raster: opaque gray ramp value per 6-bit level. */
  private[expressions] def argbPixels(id: Long): Array[Int] =
    grays(id).map { g => val v = g * 255 / 63; 0xff000000 | (v << 16) | (v << 8) | v }

  /** 4-level quantized twin raster (for the bundled-palette pair). */
  private[expressions] def argbPixels4(id: Long): Array[Int] =
    grays(id).map { g => val v = (g >> 4) * 85; 0xff000000 | (v << 16) | (v << 8) | v }

  def build(id: Long, mode: String): Array[Byte] = mode match {
    case "base" => riff(Seq("VP8L" -> vp8l(argbPixels(id), PlainOpts)))
    case "subg" => riff(Seq("VP8L" -> vp8l(argbPixels(id), PlainOpts.copy(subtractGreen = true))))
    case "pred" => riff(Seq("VP8L" -> vp8l(argbPixels(id), PlainOpts.copy(predictor = true))))
    case "pal" => riff(Seq("VP8L" -> vp8l(argbPixels(id), PlainOpts.copy(palette = true))))
    case "cache" =>
      val body = vp8l(argbPixels(id), PlainOpts.copy(cacheBits = 4, lz77 = true))
      riff(Seq(
        "VP8X" -> vp8xHeader(Dim, Dim),
        "XMP " -> s"<x:meta id='$id'/>".getBytes("UTF-8"),
        "VP8L" -> body))
    case "meta" => riff(Seq("VP8L" -> vp8l(argbPixels(id), PlainOpts.copy(metaGroups = true))))
    case "pal4" => riff(Seq("VP8L" -> vp8l(argbPixels4(id), PlainOpts.copy(palette = true, palLevels = 4))))
    case "pal4lit" => riff(Seq("VP8L" -> vp8l(argbPixels4(id), PlainOpts)))
    case "truncated" =>
      val full = build(id, "base")
      java.util.Arrays.copyOfRange(full, 0, full.length - 10)
    case "garbage" =>
      java.security.MessageDigest.getInstance("MD5").digest(s"$id|junk".getBytes("UTF-8"))
    case "lossy" =>
      // a MALFORMED `VP8 ` chunk (not a decodable keyframe): stays the
      // corrupt-row class even now that real lossy decodes
      val junk = java.security.MessageDigest.getInstance("MD5").digest(s"$id|vp8".getBytes("UTF-8"))
      riff(Seq("VP8 " -> (junk ++ junk)))
    case "vp8q8" => Vp8Fixture.build(id, 8) // real lossy, near-lossless quantizer
    case "vp8q25" => Vp8Fixture.build(id, 25) // real lossy, coarser re-encode
    case "anim" =>
      // the still image re-delivered as an ANIMATION (container-spec VP8X
      // animation flag + ANIM + per-frame ANMF): frame 1 is base's EXACT
      // VP8L stream — the poster-frame hash lands at Hamming 0 — and
      // frame 2 is a DIFFERENT image, so consulting any later frame
      // would visibly break the pair
      riff(Seq(
        "VP8X" -> vp8xAnim(Dim, Dim),
        "ANIM" -> animHeader,
        "ANMF" -> anmf(Dim, Dim, "VP8L", vp8l(argbPixels(id), PlainOpts)),
        "ANMF" -> anmf(Dim, Dim, "VP8L", vp8l(argbPixels(id + 777), PlainOpts))))
    case "animlossy" =>
      // animation whose frames are REAL lossy `VP8 ` re-encodes of the
      // same raster (the GIF->animated-WebP conversion class): frame 1 =
      // the q8 near-lossless re-encode, frame 2 a different image
      riff(Seq(
        "VP8X" -> vp8xAnim(Dim, Dim),
        "ANIM" -> animHeader,
        "ANMF" -> anmf(Dim, Dim, "VP8 ", chunkData(Vp8Fixture.build(id, 8), "VP8 ")),
        "ANMF" -> anmf(Dim, Dim, "VP8 ", chunkData(Vp8Fixture.build(id + 777, 8), "VP8 "))))
    case "animtrunc" =>
      val full = build(id, "anim")
      java.util.Arrays.copyOfRange(full, 0, 40 + (id % 30).toInt) // mid-first-ANMF
    case other => throw new IllegalArgumentException(s"synthetic_webp: unknown mode '$other'")
  }

  /** Extract a chunk's payload from a built RIFF container (fixture
    * plumbing: [[Vp8Fixture.build]] returns a whole still container and
    * the animation modes embed its `VP8 ` stream in a frame).
    */
  private def chunkData(container: Array[Byte], fourcc: String): Array[Byte] = {
    var pos = 12
    while (pos + 8 <= container.length) {
      val l = ((container(pos + 4) & 0xff) | ((container(pos + 5) & 0xff) << 8) |
        ((container(pos + 6) & 0xff) << 16) | ((container(pos + 7) & 0xff) << 24))
      if (container(pos) == fourcc.charAt(0) && container(pos + 1) == fourcc.charAt(1) &&
        container(pos + 2) == fourcc.charAt(2) && container(pos + 3) == fourcc.charAt(3))
        return java.util.Arrays.copyOfRange(container, pos + 8, pos + 8 + l)
      pos += 8 + l + (l & 1)
    }
    throw new IllegalStateException(s"fixture container lacks $fourcc")
  }

  /** VP8X with the ANIMATION flag set (container spec: flags bit 0x02). */
  private def vp8xAnim(w: Int, h: Int): Array[Byte] = {
    val b = vp8xHeader(w, h)
    b(0) = 0x02.toByte
    b
  }

  /** ANIM chunk body: BGRA background (transparent) + 2B loop count (0 =
    * infinite).
    */
  private val animHeader: Array[Byte] = new Array[Byte](6)

  /** One ANMF chunk: 16-byte frame header (x/2, y/2, w-1, h-1 as 24-bit
    * LE, 24-bit duration, flags byte: no blend, dispose-none) followed by
    * the embedded frame stream as a sub-chunk.
    */
  private def anmf(w: Int, h: Int, fourcc: String, stream: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(stream.length + 32)
    def le24(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff); out.write((v >>> 16) & 0xff)
    }
    le24(0); le24(0)        // frame at the canvas origin
    le24(w - 1); le24(h - 1)
    le24(40)                // 40 ms
    out.write(0)            // reserved(6) | blend=0 | dispose=0
    out.write(fourcc.getBytes("US-ASCII"))
    out.write(stream.length & 0xff); out.write((stream.length >>> 8) & 0xff)
    out.write((stream.length >>> 16) & 0xff); out.write((stream.length >>> 24) & 0xff)
    out.write(stream, 0, stream.length)
    if ((stream.length & 1) == 1) out.write(0) // even padding
    out.toByteArray
  }

  // --------------------------------------------------------------
  // container
  // --------------------------------------------------------------
  private def riff(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    val bodyLen = 4 + chunks.map { case (_, d) => 8 + d.length + (d.length & 1) }.sum
    out.write("RIFF".getBytes("US-ASCII")); le32(bodyLen)
    out.write("WEBP".getBytes("US-ASCII"))
    chunks.foreach { case (fourcc, data) =>
      out.write(fourcc.getBytes("US-ASCII")); le32(data.length)
      out.write(data, 0, data.length)
      if ((data.length & 1) == 1) out.write(0) // even padding
    }
    out.toByteArray
  }

  private def vp8xHeader(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](10) // flags(1) + reserved(3) + (w-1)(3) + (h-1)(3)
    val cw = w - 1; val ch = h - 1
    b(4) = (cw & 0xff).toByte; b(5) = ((cw >> 8) & 0xff).toByte; b(6) = ((cw >> 16) & 0xff).toByte
    b(7) = (ch & 0xff).toByte; b(8) = ((ch >> 8) & 0xff).toByte; b(9) = ((ch >> 16) & 0xff).toByte
    b
  }

  // --------------------------------------------------------------
  // bit writer: LSB-first packing; prefix-code bits written MSB-first
  // --------------------------------------------------------------
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def bits(v: Int, count: Int): Unit = {
      var i = 0
      while (i < count) {
        cur |= ((v >>> i) & 1) << n
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((c >>> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      out.toByteArray
    }
  }

  // --------------------------------------------------------------
  // canonical prefix codes (encoder side)
  // --------------------------------------------------------------
  /** Equal-depth complete code over the used symbols: with k symbols and
    * L = ceil(log2 k), the first `2^L - k` get length L-1 and the rest
    * L — a valid complete canonical code without frequency modeling
    * (fixture encoder, not a production compressor).
    */
  private def buildLens(used: Seq[Int], alphabet: Int): Array[Int] = {
    val lens = new Array[Int](alphabet)
    val k = used.size
    require(k >= 2, "buildLens needs >= 2 symbols (use a simple code otherwise)")
    var l = 1
    while ((1 << l) < k) l += 1
    val short = (1 << l) - k
    used.zipWithIndex.foreach { case (s, i) =>
      lens(s) = if (i < short) l - 1 else l
    }
    lens
  }

  /** Canonical code per symbol from lengths (symbol-ascending within a
    * length — the same rule the decoder uses).
    */
  private def canonical(lens: Array[Int]): Array[Int] = {
    val maxLen = lens.max
    val count = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxLen + 1)
    var code = 0
    var l = 1
    while (l <= maxLen) { next(l) = code; code = (code + count(l)) << 1; l += 1 }
    val out = new Array[Int](lens.length)
    var i = 0
    while (i < lens.length) {
      if (lens(i) > 0) { out(i) = next(lens(i)); next(lens(i)) += 1 }
      i += 1
    }
    out
  }

  /** Symbol -> (code, length) emission map for one channel; writes the
    * code definition (simple or normal form) to the stream.
    */
  private def writeChannelCode(bw: Bw, used0: Seq[Int], alphabet: Int): Map[Int, (Int, Int)] = {
    val used = if (used0.isEmpty) Seq(0) else used0.distinct.sorted
    if (used.size == 1) {
      bw.bits(1, 1) // simple
      bw.bits(0, 1) // one symbol
      bw.bits(1, 1) // 8-bit first symbol
      bw.bits(used.head, 8)
      Map(used.head -> (0, 0)) // 0-bit code
    } else if (used.size == 2) {
      bw.bits(1, 1) // simple
      bw.bits(1, 1) // two symbols
      bw.bits(1, 1) // 8-bit first symbol
      bw.bits(used(0), 8)
      bw.bits(used(1), 8)
      // canonical over symbol order: smaller symbol = 0
      Map(used(0) -> (0, 1), used(1) -> (1, 1))
    } else {
      val lens = buildLens(used, alphabet)
      writeNormalCode(bw, lens)
      val codes = canonical(lens)
      used.map(s => s -> (codes(s), lens(s))).toMap
    }
  }

  /** Transmission order of the code-length code (must match the
    * decoder's).
    */
  private val ClcOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def writeNormalCode(bw: Bw, lens: Array[Int]): Unit = {
    bw.bits(0, 1) // normal form
    // token plan: literals for nonzero lengths, 17/18 runs for zeros
    val toks = new scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]() // (clcSym, extraVal, extraBits)
    var i = 0
    while (i < lens.length) {
      if (lens(i) != 0) { toks += ((lens(i), 0, 0)); i += 1 }
      else {
        var r = 0
        while (i + r < lens.length && lens(i + r) == 0) r += 1
        i += r
        while (r > 0) {
          if (r >= 11) { val n = math.min(r, 138); toks += ((18, n - 11, 7)); r -= n }
          else if (r >= 3) { toks += ((17, r - 3, 3)); r = 0 }
          else { toks += ((0, 0, 0)); r -= 1 }
        }
      }
    }
    val clcUsed = toks.map(_._1).distinct.sorted.toSeq
    val clcLens = new Array[Int](19)
    if (clcUsed.size == 1) clcLens(clcUsed.head) = 1 // degenerate (unreached in practice)
    else {
      val built = buildLens(clcUsed, 19)
      System.arraycopy(built, 0, clcLens, 0, 19)
    }
    require(clcLens.forall(_ <= 7), "clc lengths are 3-bit fields")
    // smallest prefix of ClcOrder covering every used clc symbol (min 4)
    var n = 4
    while (!clcUsed.forall(s => ClcOrder.take(n).contains(s))) n += 1
    bw.bits(n - 4, 4)
    var j = 0
    while (j < n) { bw.bits(clcLens(ClcOrder(j)), 3); j += 1 }
    bw.bits(0, 1) // no explicit max-symbol cap
    val clcCodes = canonical(clcLens)
    toks.foreach { case (sym, ev, eb) =>
      bw.code(clcCodes(sym), clcLens(sym))
      if (eb > 0) bw.bits(ev, eb)
    }
  }

  // --------------------------------------------------------------
  // LZ77 prefix-value encoding (inverse of the decoder's prefixValue)
  // --------------------------------------------------------------
  private def prefixEncode(v: Int): (Int, Int, Int) = { // (code, extraVal, extraBits)
    if (v <= 4) (v - 1, 0, 0)
    else {
      var code = 4
      while (code < 40) {
        val extra = (code - 2) >> 1
        val offset = (2 + (code & 1)) << extra
        if (v > offset && v <= offset + (1 << extra)) return (code, v - 1 - offset, extra)
        code += 1
      }
      throw new IllegalArgumentException(s"prefixEncode: $v out of range")
    }
  }

  // --------------------------------------------------------------
  // entropy-coded image writer
  // --------------------------------------------------------------
  private sealed trait Tok { def grp: Int }
  private final case class Lit(a: Int, r: Int, g: Int, b: Int, grp: Int) extends Tok
  private final case class CacheHit(idx: Int, grp: Int) extends Tok
  private final case class Ref(len: Int, distCode: Int, grp: Int) extends Tok

  private case class Opts(
      subtractGreen: Boolean = false,
      predictor: Boolean = false,
      palette: Boolean = false,
      palLevels: Int = 64,
      cacheBits: Int = 0,
      lz77: Boolean = false,
      metaGroups: Boolean = false)
  private val PlainOpts = Opts()

  /** The VP8L chunk payload for a 16×16 ARGB raster under the given
    * encoding choices.
    */
  private[expressions] def vp8l(pixels0: Array[Int], o: Opts): Array[Byte] = {
    val bw = new Bw
    bw.bits(0x2f, 8)
    bw.bits(Dim - 1, 14); bw.bits(Dim - 1, 14)
    bw.bits(0, 1) // alpha hint
    bw.bits(0, 3) // version
    var pixels = pixels0
    var w = Dim
    // forward transforms (decoder inverts in reverse read order; with a
    // single transform declared the direction is unambiguous)
    if (o.subtractGreen) {
      bw.bits(1, 1); bw.bits(2, 2)
      pixels = pixels.map { p =>
        val g = (p >>> 8) & 0xff
        val r = (((p >>> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        (p & 0xff00ff00) | (r << 16) | b
      }
    }
    if (o.predictor) {
      bw.bits(1, 1); bw.bits(0, 2)
      bw.bits(1, 3) // bits-2 = 1 -> 8x8 blocks -> 2x2 mode image
      val modes = Array(1, 2, 11, 7) // L, T, Select, avg(L,T)
      writeEntropyImage(bw, modes.map(m => 0xff000000 | (m << 8)), 2, 2, PlainOpts)
      val res = new Array[Int](pixels.length)
      var y = 0
      while (y < Dim) {
        var x = 0
        while (x < Dim) {
          val i = y * Dim + x
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) pixels(i - 1)
            else if (x == 0) pixels(i - Dim)
            else {
              val m = modes(((y >> 3) << 1) | (x >> 3))
              val l = pixels(i - 1); val t = pixels(i - Dim); val tl = pixels(i - Dim - 1)
              m match {
                case 1 => l
                case 2 => t
                case 7 => avg2(l, t)
                case 11 => select(t, l, tl)
                case _ => throw new IllegalStateException("fixture predictor set")
              }
            }
          res(i) = subPixels(pixels(i), pred)
          x += 1
        }
        y += 1
      }
      pixels = res
    }
    if (o.palette) {
      val levels = o.palLevels
      val pal = (0 until levels).map { i =>
        val v = if (levels == 4) i * 85 else i * 255 / 63
        0xff000000 | (v << 16) | (v << 8) | v
      }.toArray
      bw.bits(1, 1); bw.bits(3, 2)
      bw.bits(levels - 1, 8)
      // delta-coded palette image (per-channel mod-256 differences)
      val deltas = pal.zipWithIndex.map { case (p, i) =>
        if (i == 0) p else subPixels(p, pal(i - 1))
      }
      writeEntropyImage(bw, deltas, levels, 1, PlainOpts)
      val lookup = pal.zipWithIndex.toMap
      val idx = pixels.map(p => lookup(p)) // fixture rasters are exact palette hits
      if (levels == 4) {
        // bundle: 2-bit sub-pixels, 4 per green byte, LSB-first
        val packedW = (Dim + 3) / 4
        val packed = new Array[Int](packedW * Dim)
        var y = 0
        while (y < Dim) {
          var px = 0
          while (px < packedW) {
            var v = 0
            var s = 0
            while (s < 4) { v |= idx(y * Dim + px * 4 + s) << (2 * s); s += 1 }
            packed(y * packedW + px) = v << 8
            px += 1
          }
          y += 1
        }
        pixels = packed; w = packedW
      } else {
        pixels = idx.map(_ << 8)
      }
    }
    bw.bits(0, 1) // end of transforms
    writeEntropyImage(bw, pixels, w, Dim, o, level0Meta = true)
    bw.bytes
  }

  /** One entropy-coded image: cache bit, optional meta-prefix image
    * (level-0 only), prefix codes, token stream.
    */
  private def writeEntropyImage(
      bw: Bw, pixels: Array[Int], w: Int, h: Int, o: Opts,
      level0Meta: Boolean = false): Unit = {
    val cacheBits = o.cacheBits
    if (cacheBits > 0) { bw.bits(1, 1); bw.bits(cacheBits, 4) } else bw.bits(0, 1)
    var numGroups = 1
    var metaBits = 0
    if (level0Meta) {
      if (o.metaGroups) {
        metaBits = 3 // 8x8 blocks
        bw.bits(1, 1)
        bw.bits(metaBits - 2, 3)
        val mw = (w + 7) / 8; val mh = (h + 7) / 8
        val meta = Array.tabulate(mw * mh) { i =>
          val mx = i % mw
          0xff000000 | ((if (mx >= mw / 2 && mw > 1) 1 else 0) << 8)
        }
        writeEntropyImage(bw, meta, mw, mh, PlainOpts)
        numGroups = 2
      } else bw.bits(0, 1)
    }
    def grpOf(pos: Int): Int =
      if (numGroups == 1) 0
      else {
        val mw = (w + 7) / 8
        val mx = (pos % w) >> metaBits
        if (mx >= mw / 2 && mw > 1) 1 else 0
      }
    // token stream with cache + LZ77 simulation (mirrors the decoder)
    val toks = new scala.collection.mutable.ArrayBuffer[Tok](pixels.length)
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val seen = if (cacheBits > 0) new Array[Boolean](1 << cacheBits) else null
    def insert(p: Int): Unit = if (cache != null) {
      val slot = (0x1e35a7bd * p) >>> (32 - cacheBits)
      cache(slot) = p; seen(slot) = true
    }
    var pos = 0
    while (pos < pixels.length) {
      var emitted = false
      if (o.lz77) {
        // longest run against dist 1 and dist w
        var bestLen = 0; var bestDist = 0
        Seq(1, w).foreach { d =>
          if (pos - d >= 0) {
            var n = 0
            while (pos + n < pixels.length && pixels(pos + n) == pixels(pos + n - d)) n += 1
            if (n > bestLen) { bestLen = n; bestDist = d }
          }
        }
        if (bestLen >= 3) {
          // alternate the two distance encodings to exercise both paths
          val plane = WebpPixelHash.distanceToPlaneCode(w, bestDist)
          val distCode = if (pos % 2 == 0 && plane > 0) plane else bestDist + 120
          toks += Ref(bestLen, distCode, grpOf(pos))
          var i = 0
          while (i < bestLen) { insert(pixels(pos + i)); i += 1 }
          pos += bestLen
          emitted = true
        }
      }
      if (!emitted && cache != null) {
        val p = pixels(pos)
        val slot = (0x1e35a7bd * p) >>> (32 - cacheBits)
        if (seen(slot) && cache(slot) == p) {
          toks += CacheHit(slot, grpOf(pos))
          insert(p); pos += 1
          emitted = true
        }
      }
      if (!emitted) {
        val p = pixels(pos)
        toks += Lit(p >>> 24, (p >>> 16) & 0xff, (p >>> 8) & 0xff, p & 0xff, grpOf(pos))
        insert(p); pos += 1
      }
    }
    // per-group used-symbol sets -> code definitions
    val greenAlpha = 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0)
    val emit = Array.tabulate(numGroups) { g =>
      val mine = toks.filter(_.grp == g)
      val greens = mine.collect {
        case Lit(_, _, gg, _, _) => gg
        case Ref(len, _, _) => 256 + prefixEncode(len)._1
        case CacheHit(idx, _) => 280 + idx
      }
      val reds = mine.collect { case Lit(_, r, _, _, _) => r }
      val blues = mine.collect { case Lit(_, _, _, b, _) => b }
      val alphas = mine.collect { case Lit(a, _, _, _, _) => a }
      val dists = mine.collect { case Ref(_, dc, _) => prefixEncode(dc)._1 }
      Array(
        writeChannelCode(bw, greens.toSeq, greenAlpha),
        writeChannelCode(bw, reds.toSeq, 256),
        writeChannelCode(bw, blues.toSeq, 256),
        writeChannelCode(bw, alphas.toSeq, 256),
        writeChannelCode(bw, dists.toSeq, 40))
    }
    // token emission
    def put(m: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (c, l) = m(sym)
      if (l > 0) bw.code(c, l)
    }
    toks.foreach {
      case Lit(a, r, g, b, grp) =>
        put(emit(grp)(0), g); put(emit(grp)(1), r); put(emit(grp)(2), b); put(emit(grp)(3), a)
      case Ref(len, distCode, grp) =>
        val (lc, lev, leb) = prefixEncode(len)
        put(emit(grp)(0), 256 + lc)
        if (leb > 0) bw.bits(lev, leb)
        val (dc, dev, deb) = prefixEncode(distCode)
        put(emit(grp)(4), dc)
        if (deb > 0) bw.bits(dev, deb)
      case CacheHit(idx, grp) =>
        put(emit(grp)(0), 280 + idx)
    }
  }

  private def avg2(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) >> 1) << 24
    val rr = ((((a >>> 16) & 0xff) + ((b >>> 16) & 0xff)) >> 1) << 16
    val gg = ((((a >>> 8) & 0xff) + ((b >>> 8) & 0xff)) >> 1) << 8
    val bb = (((a & 0xff) + (b & 0xff)) >> 1)
    aa | rr | gg | bb
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    def sub3(a: Int, b: Int, c: Int): Int = {
      val pb = b - c; val pa = a - c
      math.abs(pb) - math.abs(pa)
    }
    val d =
      sub3(t >>> 24, l >>> 24, tl >>> 24) +
        sub3((t >>> 16) & 0xff, (l >>> 16) & 0xff, (tl >>> 16) & 0xff) +
        sub3((t >>> 8) & 0xff, (l >>> 8) & 0xff, (tl >>> 8) & 0xff) +
        sub3(t & 0xff, l & 0xff, tl & 0xff)
    if (d <= 0) t else l
  }

  private def subPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) - (b >>> 24)) & 0xff) << 24
    val rr = ((((a >>> 16) & 0xff) - ((b >>> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >>> 8) & 0xff) - ((b >>> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) - (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }
}
