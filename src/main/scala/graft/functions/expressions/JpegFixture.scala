package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic synthetic BASELINE JPEG generator — the JPEG twin of the
  * PNG fixture corpus ([[graft.operators.Multimodal.pixelPngCorpus]]),
  * implemented as a native expression because entropy coding (Huffman
  * bits) is not expressible in Column byte algebra the way PNG's stored
  * deflate blocks were. Every generated payload is a REAL JFIF baseline
  * stream: SOI, (APP0), DQT, SOF0, DHT×2, (DRI), SOS, Huffman-coded
  * entropy data with byte stuffing and optional restart markers, EOI —
  * decodable by any JPEG decoder (ParserFuzzSpec differentially decodes
  * them through ImageIO).
  *
  * Source pixels (a pure function of `id`, shared by every variant of the
  * same id): a 5×5 md5-derived control grid bilinearly interpolated to
  * 16×16 — smooth enough that requantization moves cell means by only a
  * few gray levels (so quant-twin dHashes stay within a small Hamming
  * bound), random enough across ids that non-twin hashes sit ~32 bits
  * apart.
  *
  * Variants (`mode`):
  *  - `base`       — APP0 + fine quant (std table / 8) + Huffman H1
  *  - `framing`    — the SAME coefficients re-framed: no APP0, different
  *                   Huffman tables (H2), restart interval 1. Identical
  *                   decoded pixels ⇒ dHash Hamming EXACTLY 0 vs base —
  *                   the jpegtran-style lossless re-encode.
  *  - `quant`      — requantized with a coarser table (std / 4): the
  *                   quality-bump re-encode; near-identical pixels,
  *                   Hamming within a small bound vs base.
  *  - `prog`       — the SAME coefficients delivered as a REAL
  *                   progressive (SOF2) stream: DC successive
  *                   approximation (Al=1 first scan + Ah=1 refinement),
  *                   AC spectral selection in two bands each at Al=1
  *                   then refined to Al=0 — EOB-runs, ZRL, buffered
  *                   correction bits, the full T.81 Annex G machinery.
  *                   Identical coefficients ⇒ identical IDCT output ⇒
  *                   dHash Hamming EXACTLY 0 vs base — the
  *                   `jpegtran -progressive` lossless re-encode.
  *  - `truncated`  — `base` with the tail cut mid-entropy-data (the torn
  *                   download; must decode to NULL, never throw).
  *  - `garbage`    — not a JPEG at all.
  *  - `progressive`— `base` bytes with the frame marker flipped to SOF2:
  *                   an INVALID progressive stream (its single scan keeps
  *                   the baseline Ss=0..Se=63 script, which Annex G
  *                   forbids) the decoder must cleanly reject (NULL ⇒
  *                   the byte-level [[BlockHash64]] family keeps covering
  *                   it).
  */
case class SyntheticJpeg(child: Expression, mode: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_synthetic_jpeg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if JpegFixture.Modes.contains(mode) => TypeCheckSuccess
    case LongType => TypeCheckFailure(
      s"$prettyName: unknown mode '$mode' (expected one of ${JpegFixture.Modes.mkString(", ")})")
    case dt => TypeCheckFailure(
      s"$prettyName requires a long id argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    JpegFixture.build(input.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // static singleton call — nothing to serialize into the task
      val impl = s"${JpegFixture.getClass.getName.stripSuffix("$")}$$.MODULE$$"
      s"${ev.value} = $impl.build($v, \"$mode\");"
    })

  override protected def withNewChildInternal(newChild: Expression): SyntheticJpeg =
    copy(child = newChild)
}

object JpegFixture {

  val Modes: Set[String] =
    Set("base", "framing", "quant", "exif", "prog", "truncated", "garbage",
      "progressive")

  private final val Dim = 16

  /** ITU T.81 Annex K.1 luminance quantization table (natural order) —
    * the published reference table every encoder scales.
    */
  private val StdQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private def scaled(div: Int): Array[Int] = StdQuant.map(q => math.max(1, q / div))
  private val QuantFine = scaled(8)   // base + framing: near-lossless
  private val QuantCoarse = scaled(4) // the requantizing re-encode

  /** Huffman spec = (#codes per length 1..16, symbol values in canonical
    * order). Flat single-length tables: trivially valid (Kraft-feasible),
    * deliberately DIFFERENT between H1 and H2 so the framing twin shares
    * no entropy-coded bytes with its base.
    */
  private val DcVals: Array[Byte] = (0 to 11).map(_.toByte).toArray
  private val AcVals: Array[Byte] = {
    val syms = Array.newBuilder[Byte]
    syms += 0x00.toByte // EOB
    syms += 0xf0.toByte // ZRL
    for (run <- 0 to 15; size <- 1 to 10) syms += ((run << 4) | size).toByte
    syms.result() // 162 symbols
  }
  private def flatBits(len: Int, n: Int): Array[Int] = {
    val bits = new Array[Int](17); bits(len) = n; bits
  }
  private val H1Dc = (flatBits(4, 12), DcVals)
  private val H1Ac = (flatBits(8, 162), AcVals)
  private val H2Dc = (flatBits(5, 12), DcVals)
  private val H2Ac = (flatBits(9, 162), AcVals)
  /** Progressive AC alphabet: EOBn run-length symbols (r<<4|0 for
    * r=0..14, T.81 G.1.2.2) ahead of ZRL and the (run,size) grid — the
    * baseline table only carries EOB0.
    */
  private val AcProgVals: Array[Byte] = {
    val syms = Array.newBuilder[Byte]
    for (r <- 0 to 14) syms += (r << 4).toByte // EOB0..EOB14
    syms += 0xf0.toByte                        // ZRL
    for (run <- 0 to 15; size <- 1 to 10) syms += ((run << 4) | size).toByte
    syms.result() // 176 symbols
  }
  private val HPAc = (flatBits(9, 176), AcProgVals)

  /** symbol -> (code, length) from a canonical (bits, vals) spec. */
  private def encodeTable(spec: (Array[Int], Array[Byte])): Array[Int] = {
    val (bits, vals) = spec
    val table = Array.fill(256)(-1) // packed (len << 16 | code)
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        table(vals(k) & 0xff) = (l << 16) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    table
  }
  private val EncH1Dc = encodeTable(H1Dc)
  private val EncH1Ac = encodeTable(H1Ac)
  private val EncH2Dc = encodeTable(H2Dc)
  private val EncH2Ac = encodeTable(H2Ac)
  private val EncHPAc = encodeTable(HPAc)

  /** 16×16 luma source: 9×9 md5 control grid at 2-px spacing, integer
    * bilinear. The 2-px control spacing matches the dHash cell pitch
    * (16/9 ≈ 1.8 px), so every gradient bit sees a near-independent draw —
    * hashes across ids stay ~32 bits apart even over thousands of docs
    * (a coarser grid correlates adjacent bits and birthday-collides into
    * the pair threshold at corpus size) — while the field stays smooth
    * enough inside each cell that requantization barely moves cell means.
    */
  private[expressions] def sourcePixels(id: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val ctrl = new Array[Int](81)
    var d = 0
    while (d < 6) {
      md.reset()
      val dig = md.digest(s"jpx|$id|$d".getBytes("UTF-8"))
      var j = 0
      while (j < 16 && d * 16 + j < 81) { ctrl(d * 16 + j) = dig(j) & 0xff; j += 1 }
      d += 1
    }
    val px = new Array[Int](Dim * Dim)
    var y = 0
    while (y < Dim) {
      val gy = y / 2; val fy = y % 2
      var x = 0
      while (x < Dim) {
        val gx = x / 2; val fx = x % 2
        val c00 = ctrl(gy * 9 + gx); val c10 = ctrl(gy * 9 + gx + 1)
        val c01 = ctrl((gy + 1) * 9 + gx); val c11 = ctrl((gy + 1) * 9 + gx + 1)
        px(y * Dim + x) = ((2 - fx) * (2 - fy) * c00 + fx * (2 - fy) * c10 +
          (2 - fx) * fy * c01 + fx * fy * c11 + 2) / 4
        x += 1
      }
      y += 1
    }
    px
  }

  /** Exact forward DCT (StrictMath cosines — bit-reproducible across JVMs)
    * + round-half-away quantization, natural order out.
    */
  private def fdctQuant(px: Array[Int], bx: Int, by: Int, quant: Array[Int]): Array[Int] = {
    val cos = CosTable
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += (px((by + y) * Dim + bx + x) - 128) * cos(x)(v) * cos(y)(u)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) 0.70710678118654752 else 1.0
        val cv = if (v == 0) 0.70710678118654752 else 1.0
        val f = 0.25 * cu * cv * s
        val q = quant(u * 8 + v)
        // clamp to ±1023 so every symbol fits the flat tables: AC sizes
        // reach 10, DC diffs reach 11 (smooth fixtures never get close)
        val r = StrictMath.round(f / q).toInt
        out(u * 8 + v) = math.max(-1023, math.min(1023, r))
        v += 1
      }
      u += 1
    }
    out
  }
  private val CosTable: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the current byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (n > 0) { put(0xff, 8 - n) }
  }

  private def magnitude(v: Int): Int = {
    var t = 0; var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  private def writeSeg(out: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val l = body.length + 2
    out.write((l >> 8) & 0xff); out.write(l & 0xff)
    out.write(body, 0, body.length)
  }

  private def dqtBody(quant: Array[Int]): Array[Byte] = {
    val body = new Array[Byte](65)
    body(0) = 0 // Pq=0 (8-bit), Tq=0
    var k = 0
    while (k < 64) { body(1 + k) = quant(JpegPixelHash.ZigZag(k)).toByte; k += 1 }
    body
  }

  private def dhtBody(tc: Int, spec: (Array[Int], Array[Byte])): Array[Byte] = {
    val (bits, vals) = spec
    val body = new Array[Byte](17 + vals.length)
    body(0) = (tc << 4).toByte // Th=0
    var l = 1
    while (l <= 16) { body(l) = bits(l).toByte; l += 1 }
    System.arraycopy(vals, 0, body, 17, vals.length)
    body
  }

  // ---- progressive (SOF2) encoder -----------------------------------
  // T.81 Annex G successive-approximation + spectral-selection delivery
  // of base's EXACT quantized coefficients; scan-by-scan algorithm per
  // libjpeg's jcphuff (encode_mcu_{DC,AC}_{first,refine}): EOB-run
  // accumulation, ZRL folding, per-run buffered correction bits.

  private def ptAc(v: Int, al: Int): Int = if (v >= 0) v >> al else -((-v) >> al)

  /** One AC first scan of `band` at point transform `al` (G.1.2.2). */
  private def acFirstScan(out: java.io.ByteArrayOutputStream,
      zz: Array[Array[Int]], ss: Int, se: Int, al: Int): Unit = {
    writeSeg(out, 0xda, Array[Byte](1, 1, 0, ss.toByte, se.toByte, al.toByte))
    val w = new BitWriter(out)
    var eobrun = 0
    def flushEob(): Unit = if (eobrun > 0) {
      var nbits = 0; var t = eobrun
      while ({ t >>= 1; t != 0 }) nbits += 1
      val sym = EncHPAc(nbits << 4)
      w.put(sym & 0xffff, sym >>> 16)
      if (nbits > 0) w.put(eobrun & ((1 << nbits) - 1), nbits)
      eobrun = 0
    }
    zz.foreach { z =>
      var run = 0
      var k = ss
      while (k <= se) {
        val v = ptAc(z(k), al)
        if (v == 0) run += 1
        else {
          flushEob() // pending EOB-run ends before this block's first symbol
          while (run > 15) {
            val zr = EncHPAc(0xf0); w.put(zr & 0xffff, zr >>> 16); run -= 16
          }
          val s = magnitude(v)
          val sym = EncHPAc((run << 4) | s)
          w.put(sym & 0xffff, sym >>> 16)
          w.put(if (v < 0) v + (1 << s) - 1 else v, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) eobrun += 1 // block's band tail is zero: extend the EOB-run
    }
    flushEob()
    w.flush()
  }

  /** One AC refinement scan of `band`, Ah=al+1 → Al=al (G.1.2.3):
    * newly-significant coefficients as (run,1)+sign, one buffered
    * correction bit per previously-nonzero coefficient passed, emitted
    * after the symbol that advances over it (ZRL / run+1 / EOBn).
    */
  private def acRefineScan(out: java.io.ByteArrayOutputStream,
      zz: Array[Array[Int]], ss: Int, se: Int, al: Int): Unit = {
    writeSeg(out, 0xda,
      Array[Byte](1, 1, 0, ss.toByte, se.toByte, (((al + 1) << 4) | al).toByte))
    val w = new BitWriter(out)
    var eobrun = 0
    val be = scala.collection.mutable.ArrayBuffer.empty[Int] // EOB-region bits
    def flushEob(): Unit = if (eobrun > 0) {
      var nbits = 0; var t = eobrun
      while ({ t >>= 1; t != 0 }) nbits += 1
      val sym = EncHPAc(nbits << 4)
      w.put(sym & 0xffff, sym >>> 16)
      if (nbits > 0) w.put(eobrun & ((1 << nbits) - 1), nbits)
      eobrun = 0
      be.foreach(b => w.put(b, 1)); be.clear()
    }
    zz.foreach { z =>
      val absv = Array.tabulate(se - ss + 1)(i => math.abs(z(ss + i)) >> al)
      var eob = ss - 1 // last newly-significant position (ZRL-fold bound)
      var k = ss
      while (k <= se) { if (absv(k - ss) == 1) eob = k; k += 1 }
      var run = 0
      val br = scala.collection.mutable.ArrayBuffer.empty[Int] // in-block bits
      k = ss
      while (k <= se) {
        val t = absv(k - ss)
        if (t == 0) run += 1
        else {
          // ZRLs the moment the zero-history run exceeds 15 at ANY
          // nonzero position — so br never holds bits for positions past
          // the 16 slots this ZRL covers — but never when the rest of
          // the block folds into an EOB
          while (run > 15 && k <= eob) {
            flushEob()
            val zr = EncHPAc(0xf0); w.put(zr & 0xffff, zr >>> 16); run -= 16
            br.foreach(b => w.put(b, 1)); br.clear()
          }
          if (t > 1) br += (t & 1) // previously nonzero: one correction bit
          else { // t == 1: newly significant at this precision
            flushEob()
            val sym = EncHPAc((run << 4) | 1)
            w.put(sym & 0xffff, sym >>> 16)
            w.put(if (z(k) < 0) 0 else 1, 1)
            br.foreach(b => w.put(b, 1)); br.clear()
            run = 0
          }
        }
        k += 1
      }
      if (run > 0 || br.nonEmpty) { eobrun += 1; be ++= br }
    }
    flushEob()
    w.flush()
  }

  private def buildProgressive(id: Long): Array[Byte] = {
    val px = sourcePixels(id)
    val zz = Array((0, 0), (8, 0), (0, 8), (8, 8)).map { case (bx, by) =>
      val nat = fdctQuant(px, bx, by, QuantFine)
      Array.tabulate(64)(k => nat(JpegPixelHash.ZigZag(k))) // zigzag order
    }
    val out = new java.io.ByteArrayOutputStream(768)
    out.write(0xff); out.write(0xd8) // SOI
    writeSeg(out, 0xe0, // APP0 JFIF 1.1, no thumbnail (as base)
      Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSeg(out, 0xdb, dqtBody(QuantFine))
    writeSeg(out, 0xc2, Array[Byte](8, 0, Dim.toByte, 0, Dim.toByte, 1, 1, 0x11, 0))
    writeSeg(out, 0xc4, dhtBody(0, H1Dc))
    writeSeg(out, 0xc4, dhtBody(1, HPAc))
    // scan 1: DC first at Al=1 (arithmetic-shift point transform, G.1.2.1)
    writeSeg(out, 0xda, Array[Byte](1, 1, 0, 0, 0, 0x01))
    locally {
      val w = new BitWriter(out)
      var pred = 0
      zz.foreach { z =>
        val v = z(0) >> 1
        val diff = v - pred; pred = v
        val t = magnitude(diff)
        val dc = EncH1Dc(t)
        w.put(dc & 0xffff, dc >>> 16)
        if (t > 0) w.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      }
      w.flush()
    }
    acFirstScan(out, zz, 1, 5, 1)   // scan 2: low band at Al=1
    acFirstScan(out, zz, 6, 63, 1)  // scan 3: high band at Al=1
    // scan 4: DC refinement Ah=1 -> Al=0 — one raw bit per block
    writeSeg(out, 0xda, Array[Byte](1, 1, 0, 0, 0, 0x10))
    locally {
      val w = new BitWriter(out)
      zz.foreach(z => w.put(z(0) & 1, 1))
      w.flush()
    }
    acRefineScan(out, zz, 1, 5, 0)  // scan 5: low band Ah=1 -> Al=0
    acRefineScan(out, zz, 6, 63, 0) // scan 6: high band Ah=1 -> Al=0
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  def build(id: Long, mode: String): Array[Byte] = mode match {
    case "garbage" => s"NOTJPEG|$id".getBytes("UTF-8")
    case "prog" => buildProgressive(id)
    case "truncated" =>
      val full = build(id, "base")
      java.util.Arrays.copyOfRange(full, 0, full.length - 20)
    case "progressive" =>
      val full = build(id, "base")
      // flip the frame marker SOF0 -> SOF2: scan for FF C0
      var i = 2
      while (i + 1 < full.length && !((full(i) & 0xff) == 0xff && (full(i + 1) & 0xff) == 0xc0))
        i += 1
      full(i + 1) = 0xc2.toByte
      full
    case _ =>
      val framing = mode == "framing"
      val exif = mode == "exif"
      val quant = if (mode == "quant") QuantCoarse else QuantFine
      val (dcT, acT) = if (framing) (EncH2Dc, EncH2Ac) else (EncH1Dc, EncH1Ac)
      val (dcSpec, acSpec) = if (framing) (H2Dc, H2Ac) else (H1Dc, H1Ac)
      // the EXIF re-encode stores the image PHYSICALLY rotated 90 CCW and
      // marks orientation 6 (display = rotate 90 CW) — the decoder must
      // normalize it back onto its upright original's dHash
      val px0 = sourcePixels(id)
      val px =
        if (!exif) px0
        else {
          val r = new Array[Int](Dim * Dim)
          var y = 0
          while (y < Dim) {
            var x = 0
            while (x < Dim) { r((Dim - 1 - x) * Dim + y) = px0(y * Dim + x); x += 1 }
            y += 1
          }
          r
        }
      val out = new java.io.ByteArrayOutputStream(512)
      out.write(0xff); out.write(0xd8) // SOI
      if (exif) writeSeg(out, 0xe1, // APP1 EXIF: one-entry IFD0, orientation 6
        Array[Byte]('E', 'x', 'i', 'f', 0, 0,
          'M', 'M', 0, 42, 0, 0, 0, 8,          // TIFF big-endian, IFD0 at +8
          0, 1,                                  // 1 entry
          0x01, 0x12, 0, 3, 0, 0, 0, 1, 0, 6, 0, 0, // tag 0x0112 SHORT x1 = 6
          0, 0, 0, 0))                           // next-IFD offset: none
      if (!framing) writeSeg(out, 0xe0, // APP0 JFIF 1.1, no thumbnail
        Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
      writeSeg(out, 0xdb, dqtBody(quant))
      writeSeg(out, 0xc0, Array[Byte](8, 0, Dim.toByte, 0, Dim.toByte, 1, 1, 0x11, 0))
      writeSeg(out, 0xc4, dhtBody(0, dcSpec))
      writeSeg(out, 0xc4, dhtBody(1, acSpec))
      if (framing) writeSeg(out, 0xdd, Array[Byte](0, 1)) // DRI: interval 1
      writeSeg(out, 0xda, Array[Byte](1, 1, 0, 0, 63, 0))
      var w = new BitWriter(out)
      var dcPred = 0
      var rst = 0
      var blk = 0
      val blocks = Seq((0, 0), (8, 0), (0, 8), (8, 8))
      blocks.foreach { case (bx, by) =>
        if (framing && blk > 0) {
          w.flush()
          out.write(0xff); out.write(0xd0 + rst)
          rst = (rst + 1) & 7
          dcPred = 0
          w = new BitWriter(out)
        }
        val coef = fdctQuant(px, bx, by, quant)
        val diff = coef(0) - dcPred
        dcPred = coef(0)
        val t = magnitude(diff)
        val dc = dcT(t)
        w.put(dc & 0xffff, dc >>> 16) // packed (len << 16 | code)
        if (t > 0) w.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        var k = 1
        var run = 0
        while (k < 64) {
          val v = coef(JpegPixelHash.ZigZag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { val z = acT(0xf0); w.put(z & 0xffff, z >>> 16); run -= 16 }
            val s = magnitude(v)
            val sym = acT((run << 4) | s)
            w.put(sym & 0xffff, sym >>> 16)
            w.put(if (v < 0) v + (1 << s) - 1 else v, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val e = acT(0x00); w.put(e & 0xffff, e >>> 16) } // EOB
        blk += 1
      }
      w.flush()
      out.write(0xff); out.write(0xd9) // EOI
      out.toByteArray
  }
}
