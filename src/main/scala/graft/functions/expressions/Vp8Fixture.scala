package graft.functions.expressions

/** Deterministic LOSSY-VP8 keyframe encoder for fixture corpora — the
  * planted-twin source for the lossy-WebP dedup rows (the CDN
  * JPEG→WebP re-encode class). Encodes the SHARED 16x16 gray raster
  * ([[WebpFixture.grays]], same content as the PNG/JPEG/GIF/VP8L legs)
  * as one B_PRED macroblock of all-B_DC subblocks: full forward DCT,
  * per-position quantization at a caller-chosen quantizer index, token
  * writing against the default coefficient probabilities, and the RFC
  * 6386 s7.3 boolean ENCODER with carry propagation. Filter level 0 and
  * B_PRED (no Y2) keep the stream minimal while still exercising the
  * production decoder's mode trees, token machinery, and iDCT.
  *
  * The encoder mirrors the decoder's reconstruction loop exactly
  * (predict → quantize → dequantize → inverse transform → add), so its
  * [[reconstruct]] is the INTEGER-EXACT expected decode — Vp8FixtureSpec
  * asserts [[Vp8Decode]] reproduces it byte-for-byte, and the vendored
  * libwebp differential pins the decoder to the real codec.
  */
private[expressions] object Vp8Fixture {
  import Vp8Decode.{AcQ, Bands, BModeTree, CatBase, CatProbs, CoeffProba0,
    CoeffUpdateProba, DcQ, KfUvModeProb, KfYModeProb, KfYModeTree, TokenTree,
    UvModeTree, Zigzag}

  private val Dim = 16

  /** RFC 6386 s7.3 boolean encoder (with carry walk-back). */
  private final class Bw {
    private val out = new scala.collection.mutable.ArrayBuffer[Byte](256)
    private var range = 255L
    private var bottom = 0L
    private var bitCount = 24

    def bool(prob: Int, v: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (v != 0) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & 0x80000000L) != 0) {
          // carry into the already-emitted bytes
          var q = out.length - 1
          while (q >= 0 && out(q) == 0xff.toByte) { out(q) = 0; q -= 1 }
          if (q >= 0) out(q) = (out(q) + 1).toByte
        }
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out += ((bottom >> 24) & 0xff).toByte
          bottom &= 0xffffffL
          bitCount = 8
        }
      }
    }

    def lit(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }

    /** Write `symbol` along `tree` from `startIdx` with probs at a flat
      * offset (the encoder twin of the decoder's treeFlat).
      */
    def tree(t: Array[Int], probs: Array[Int], probOff: Int, symbol: Int,
        startIdx: Int = 0): Unit = {
      val path = treePath(t, symbol, startIdx)
      var i = startIdx
      path.foreach { b =>
        bool(probs(probOff + (i >> 1)), b)
        i = t(i + b)
      }
    }

    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { bool(128, 0); i += 1 }
      out.toArray
    }
  }

  /** Bit path from `startIdx` to the leaf `-symbol` (small trees: DFS). */
  private def treePath(t: Array[Int], symbol: Int, startIdx: Int): List[Int] = {
    def dfs(i: Int, acc: List[Int]): Option[List[Int]] = {
      var found: Option[List[Int]] = None
      var b = 0
      while (b < 2 && found.isEmpty) {
        val nxt = t(i + b)
        found =
          if (nxt <= 0) { if (-nxt == symbol) Some((b :: acc).reverse) else None }
          else dfs(nxt, b :: acc)
        b += 1
      }
      found
    }
    dfs(startIdx, Nil).getOrElse(
      throw new IllegalArgumentException(s"symbol $symbol not in tree"))
  }

  /** libwebp's integer forward DCT (the encoder-side pair of the
    * decoder's iDCT; only round-trip closeness matters here).
    */
  private def fdct(res: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val d0 = res(i * 4); val d1 = res(i * 4 + 1)
      val d2 = res(i * 4 + 2); val d3 = res(i * 4 + 3)
      val a0 = d0 + d3; val a1 = d1 + d2; val a2 = d1 - d2; val a3 = d0 - d3
      tmp(0 + i * 4) = (a0 + a1) * 8
      tmp(1 + i * 4) = (a2 * 2217 + a3 * 5352 + 1812) >> 9
      tmp(2 + i * 4) = (a0 - a1) * 8
      tmp(3 + i * 4) = (a3 * 2217 - a2 * 5352 + 937) >> 9
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val a0 = tmp(0 + i) + tmp(12 + i); val a1 = tmp(4 + i) + tmp(8 + i)
      val a2 = tmp(4 + i) - tmp(8 + i); val a3 = tmp(0 + i) - tmp(12 + i)
      out(0 + i) = (a0 + a1 + 7) >> 4
      out(4 + i) = ((a2 * 2217 + a3 * 5352 + 12000) >> 16) + (if (a3 != 0) 1 else 0)
      out(8 + i) = (a0 - a1 + 7) >> 4
      out(12 + i) = (a3 * 2217 - a2 * 5352 + 51000) >> 16
      i += 1
    }
    out
  }

  /** The decoder's iDCT (same integer math as [[Vp8Decode]]'s), used to
    * mirror reconstruction.
    */
  private def idct(c: Array[Int]): Array[Int] = {
    def mul1(a: Int) = ((a * 20091) >> 16) + a
    def mul2(a: Int) = (a * 35468) >> 16
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = c(i) + c(8 + i); val b = c(i) - c(8 + i)
      val cc = mul2(c(4 + i)) - mul1(c(12 + i)); val d = mul1(c(4 + i)) + mul2(c(12 + i))
      tmp(i * 4) = a + d; tmp(i * 4 + 1) = b + cc
      tmp(i * 4 + 2) = b - cc; tmp(i * 4 + 3) = a - d
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val dc = tmp(i) + 4
      val a = dc + tmp(8 + i); val b = dc - tmp(8 + i)
      val cc = mul2(tmp(4 + i)) - mul1(tmp(12 + i)); val d = mul1(tmp(4 + i)) + mul2(tmp(12 + i))
      out(i * 4) = (a + d) >> 3; out(i * 4 + 1) = (b + cc) >> 3
      out(i * 4 + 2) = (b - cc) >> 3; out(i * 4 + 3) = (a - d) >> 3
      i += 1
    }
    out
  }

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Encode + mirrored reconstruction: returns (container bytes, the
    * exact luma plane the decoder must produce).
    */
  def buildWithRecon(id: Long, qi: Int): (Array[Byte], Array[Int]) = {
    require(qi >= 0 && qi <= 117, "quantizer index out of range")
    val src = WebpFixture.grays(id).map(g => g * 255 / 63) // luma = gray
    val qdc = DcQ(qi)
    val qac = AcQ(qi)

    // ---- token partition: 16 B_DC luma blocks + 8 zero chroma blocks ----
    val recon = new Array[Int](Dim * Dim)
    val quantized = new Array[Array[Int]](16) // zigzag-order quantized levels
    var sb = 0
    while (sb < 16) {
      val r = sb >> 2; val c = sb & 3
      val x0 = c * 4; val y0 = r * 4
      // B_DC prediction from the mirrored reconstruction (borders 127/129)
      var sum = 4
      var j = 0
      while (j < 4) {
        sum += (if (y0 == 0) 127 else recon((y0 - 1) * Dim + x0 + j))
        sum += (if (x0 == 0) 129 else recon((y0 + j) * Dim + x0 - 1))
        j += 1
      }
      val dc = sum >> 3
      val res = new Array[Int](16)
      j = 0
      while (j < 16) {
        res(j) = src((y0 + (j >> 2)) * Dim + x0 + (j & 3)) - dc
        j += 1
      }
      val freq = fdct(res)
      // quantize in zigzag order; dequantize for the mirrored recon
      val levels = new Array[Int](16)
      val deq = new Array[Int](16)
      j = 0
      while (j < 16) {
        val pos = Zigzag(j)
        val q = if (j == 0) qdc else qac
        val v = freq(pos)
        val lvl = (if (v < 0) -((-v + q / 2) / q) else (v + q / 2) / q)
        levels(j) = lvl
        deq(pos) = lvl * q
        j += 1
      }
      quantized(sb) = levels
      val add = idct(deq)
      j = 0
      while (j < 16) {
        recon((y0 + (j >> 2)) * Dim + x0 + (j & 3)) = clip255(dc + add(j))
        j += 1
      }
      sb += 1
    }

    val tokens = new Bw
    // nonzero contexts (4 left + 4 above for Y; 2+2 per chroma)
    val aboveNzY = new Array[Int](4); val leftNzY = new Array[Int](4)
    sb = 0
    while (sb < 16) {
      val r = sb >> 2; val c = sb & 3
      val nz = writeCoeffs(tokens, 3, leftNzY(r) + aboveNzY(c), 0, quantized(sb))
      leftNzY(r) = nz; aboveNzY(c) = nz
      sb += 1
    }
    // chroma: all-zero blocks (immediate EOB at ctx 0)
    var i = 0
    while (i < 8) {
      writeCoeffs(tokens, 2, 0, 0, new Array[Int](16))
      i += 1
    }
    val tokenBytes = tokens.finish()

    // ---- first partition: header + modes ----
    val hdr = new Bw
    hdr.lit(0, 1); hdr.lit(0, 1) // color space, clamping
    hdr.lit(0, 1) // segmentation off
    hdr.lit(0, 1) // normal filter
    hdr.lit(0, 6) // filter level 0: no deblocking
    hdr.lit(0, 3) // sharpness
    hdr.lit(0, 1) // lf delta off
    hdr.lit(0, 2) // one token partition
    hdr.lit(qi, 7) // y ac qi
    var d = 0
    while (d < 5) { hdr.bool(128, 0); d += 1 } // no quant deltas
    hdr.lit(1, 1) // refresh entropy
    i = 0
    while (i < 1056) { hdr.bool(CoeffUpdateProba(i), 0); i += 1 } // no updates
    hdr.lit(1, 1) // mb_no_skip_coeff on
    hdr.lit(128, 8) // skip prob
    // single MB: skip=0, ymode=B_PRED, 16 x B_DC, uvmode=DC
    hdr.bool(128, 0) // not skipped
    hdr.tree(KfYModeTree, KfYModeProb, 0, 4)
    sb = 0
    while (sb < 16) {
      // context: above/left submodes are all B_DC (0) here
      hdr.tree(BModeTree, Vp8Decode.KfBModeProba, 0, 0)
      sb += 1
    }
    hdr.tree(UvModeTree, KfUvModeProb, 0, 0)
    val hdrBytes = hdr.finish()

    // ---- frame assembly ----
    val fps = hdrBytes.length
    val tag = (0) | (0 << 1) | (1 << 4) | (fps << 5) // keyframe, ver 0, shown
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(tag & 0xff); buf.write((tag >> 8) & 0xff); buf.write((tag >> 16) & 0xff)
    buf.write(0x9d); buf.write(0x01); buf.write(0x2a)
    buf.write(Dim & 0xff); buf.write((Dim >> 8) & 0x3f)
    buf.write(Dim & 0xff); buf.write((Dim >> 8) & 0x3f)
    buf.write(hdrBytes)
    buf.write(tokenBytes)
    val payload = buf.toByteArray
    (riff(payload), recon)
  }

  /** Lossy container for the shared raster at quantizer index `qi`. */
  def build(id: Long, qi: Int): Array[Byte] = buildWithRecon(id, qi)._1

  /** Token run for one block (encoder twin of the decoder's
    * decodeCoeffs); returns the nonzero flag for neighbor contexts.
    */
  private def writeCoeffs(
      bw: Bw, blockType: Int, ctx0: Int, firstCoeff: Int,
      levels: Array[Int]): Int = {
    var last = -1
    var j = 15
    while (j >= firstCoeff && last < 0) { if (levels(j) != 0) last = j; j -= 1 }
    var n = firstCoeff
    var ctx = ctx0
    var startIdx = 0
    while (n <= (if (last < 0) -1 else last)) {
      val v = levels(n)
      val probOff = ((blockType * 8 + Bands(n)) * 3 + ctx) * 11
      val a = math.abs(v)
      val token =
        if (a == 0) 0
        else if (a <= 4) a
        else if (a <= 6) 5
        else if (a <= 10) 6
        else if (a <= 18) 7
        else if (a <= 34) 8
        else if (a <= 66) 9
        else 10
      bw.tree(TokenTree, CoeffProba0, probOff, token, startIdx)
      if (token == 0) {
        ctx = 0; startIdx = 2
      } else {
        startIdx = 0
        if (token >= 5) {
          val cat = token - 5
          val extra = a - CatBase(cat)
          val cp = CatProbs(cat)
          var i = 0
          while (i < cp.length) {
            bw.bool(cp(i), (extra >> (cp.length - 1 - i)) & 1)
            i += 1
          }
        }
        bw.bool(128, if (v < 0) 1 else 0)
        ctx = if (a == 1) 1 else 2
      }
      n += 1
    }
    if (last < 15 && (last >= firstCoeff || last < 0)) {
      // EOB (never directly after a zero token: zeros before it were
      // only emitted ahead of a nonzero)
      val probOff = ((blockType * 8 + Bands(if (last < 0) firstCoeff else last + 1)) * 3 +
        (if (last < 0) ctx0 else ctx)) * 11
      bw.tree(TokenTree, CoeffProba0, probOff,
        11, if (last < 0) 0 else startIdx)
    }
    if (last >= firstCoeff) 1 else 0
  }

  private def riff(vp8: Array[Byte]): Array[Byte] = {
    val pad = vp8.length & 1
    val out = java.nio.ByteBuffer.allocate(20 + vp8.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(12 + vp8.length + pad)
      .put("WEBP".getBytes("US-ASCII"))
      .put("VP8 ".getBytes("US-ASCII")).putInt(vp8.length).put(vp8)
    out.array()
  }
}
