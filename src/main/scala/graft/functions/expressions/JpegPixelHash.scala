package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** PIXEL-LEVEL perceptual hash for BASELINE JPEG payloads — the
  * [[PngPixelHash]] contract extended to the DOMINANT crawl image format:
  * parse the JFIF/EXIF marker stream, Huffman-decode the entropy data,
  * dequantize, run the deterministic fixed-point integer IDCT (the
  * Loeffler-Ligtenberg-Moshovitz factorization at 13-bit precision — the
  * classic "islow" exact-integer path, so every engine reconstructs the
  * same samples; no float, no FMA, no libm), and dHash the LUMA plane on
  * the same 9×8 grid. Returns NULL for anything that is not a
  * cleanly-decodable baseline JPEG — progressive (SOF2) and arithmetic
  * (SOF9+) frames, 12-bit precision, truncated entropy data, bad Huffman
  * streams, dimensions outside the [[PngPixelHash]] gates — never throws
  * (ParserFuzzSpec).
  *
  * WHY luma only: dHash is a gradient hash over integer luma, and in
  * JPEG's YCbCr the luma IS the Y component — so the chroma blocks are
  * Huffman-decoded only to advance the bitstream (their DC predictors
  * tracked, their coefficients discarded) and never IDCT'd or upsampled.
  * That skips the color convert entirely AND removes the chroma-
  * subsampling variable: a 4:2:0 re-encode of a 4:4:4 original keeps its
  * Y plane, so the hash still lands the pair.
  *
  * WHY pixels, not bytes: a re-encoded JPEG — different Huffman tables
  * (jpegtran -optimize), different quant tables (quality bump), restart
  * markers added, metadata stripped — shares almost no compressed bytes
  * with its original, so [[BlockHash64]] provably misses the single most
  * common duplicate class in a crawled multimodal corpus. Decoding
  * re-encode twins: identical framing-only re-encodes land at Hamming 0
  * exactly (same coefficients ⇒ the integer IDCT is bit-reproducible);
  * requantized re-encodes land within a few gradient bits.
  *
  * Supported: SOF0/SOF1 (baseline + extended sequential Huffman), 8-bit,
  * 1- or 3-component, any sampling factors 1..4, restart intervals, one
  * interleaved scan (or the single-component non-interleaved scan).
  * Everything else — progressive, arithmetic, hierarchical, CMYK,
  * multi-scan — keeps the byte-level [[BlockHash64]] fingerprint.
  *
  * Scale: one codegen'd projection, payload never shuffles — only the
  * 8-byte hash flows into the banded pair machinery
  * ([[graft.operators.Dedup.hammingPairs64]]).
  */
case class JpegPixelHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_pixel_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    JpegPixelHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // static singleton call — nothing to serialize into the task
      val impl = s"${JpegPixelHash.getClass.getName.stripSuffix("$")}$$.MODULE$$"
      val tmp = ctx.freshName("jxh")
      s"""
        |java.lang.Long $tmp = $impl.hash($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp.longValue(); }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegPixelHash =
    copy(child = newChild)
}

object JpegPixelHash {

  /** Zigzag scan position -> natural (row-major) position, ITU T.81 fig 5. */
  private[expressions] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  def hash(b: Array[Byte]): java.lang.Long =
    try {
      val g = decodeLuma(b)
      if (g == null) null else java.lang.Long.valueOf(PngPixelHash.dhash(g.px, g.w, g.h))
    } catch { case scala.util.control.NonFatal(_) => null }

  /** One canonical Huffman table: the T.81 F.2.2.3 DECODE structures. */
  private final class HuffTable(bits: Array[Int], val vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  private final class Component {
    var id = 0
    var h = 1; var v = 1
    var tq = 0        // quant table selector
    var dcTbl = 0; var acTbl = 0
    var dcPred = 0
  }

  /** MSB-first entropy-segment bit reader with 0xFF00 unstuffing. A bare
    * marker (0xFF 0xD0-D7, EOI, ...) or end-of-input stops refills
    * (`drained` — NORMAL near the end of a scan: the final blocks decode
    * from the buffered bits); `bad` is set only when a read actually
    * comes up short. The marker itself is never consumed: the caller
    * byte-aligns onto the expected restart marker or finishes the scan.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0L
    private var cnt = 0
    private var drained = false
    var bad = false

    private def fill(): Unit = {
      while (cnt <= 56 && !drained) {
        if (pos >= b.length) { drained = true; return }
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) { drained = true; return }
          val nx = b(pos + 1) & 0xff
          if (nx == 0x00) { pos += 2 }            // stuffed literal FF
          else { drained = true; return }
        } else pos += 1
        buf = (buf << 8) | v
        cnt += 8
      }
    }

    def bit(): Int = {
      if (cnt == 0) { fill(); if (cnt == 0) return -1 }
      cnt -= 1
      ((buf >>> cnt) & 1L).toInt
    }

    def bits(n: Int): Int = {
      if (n == 0) return 0
      if (cnt < n) { fill(); if (cnt < n) return -1 }
      cnt -= n
      ((buf >>> cnt) & ((1L << n) - 1)).toInt
    }

    /** Drop to the byte boundary and position `pos` at the next raw byte
      * (used at restart markers, which are byte-aligned by construction).
      */
    def align(): Unit = { buf = 0L; cnt = 0 }

    /** Resume after a consumed restart marker: reset every flag and read
      * from `newPos`.
      */
    def resume(newPos: Int): Unit = {
      pos = newPos; buf = 0L; cnt = 0; drained = false; bad = false
    }

    def decode(t: HuffTable): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (code > t.maxCode(l)) {
        val nb = bit()
        if (nb < 0) return -1
        code = (code << 1) | nb
        l += 1
        if (l > 16) return -1
      }
      val idx = t.valPtr(l) + code - t.minCode(l)
      if (idx < 0 || idx >= t.vals.length) return -1
      t.vals(idx) & 0xff
    }

    /** RECEIVE + EXTEND (T.81 F.2.2.1): read `t` magnitude bits. */
    def extend(t: Int): Int = {
      if (t == 0) return 0
      val v = bits(t)
      if (v < 0) { bad = true; return 0 }
      if (v < (1 << (t - 1))) v - (1 << t) + 1 else v
    }
  }

  /** Full baseline decode of the LUMA component to an integer plane, or
    * null on anything unclean.
    */
  private[expressions] def decodeLuma(b: Array[Byte]): PngPixelHash.Gray = {
    if (b == null || b.length < 16) return null
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null // SOI
    var pos = 2
    val quant = Array.ofDim[Int](4, 64) // stored in ZIGZAG order
    val quantSeen = new Array[Boolean](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var sofSeen = false
    var progressive = false
    var prog: ProgState = null
    var entropySkipTo = -1
    var orientation = 1

    while (pos + 1 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return null
      // fill bytes: any number of FFs may precede the marker code
      while (pos < b.length && (b(pos) & 0xff) == 0xff) pos += 1
      if (pos >= b.length) return null
      val m = b(pos) & 0xff; pos += 1
      m match {
        case 0xd8 => return null                       // a second SOI: garbage
        case 0xd9 =>
          // EOI: a progressive frame finishes HERE (scans accumulated);
          // for baseline it means no scan was reached — garbage
          if (prog == null) return null
          val g = finishProgressive(prog, comps, quant, quantSeen)
          val og = orient(g, orientation)
          return if (og == null || og.w < 9 || og.h < 8) null else og
        case 0x01 => ()                                // TEM: standalone
        case x if x >= 0xd0 && x <= 0xd7 => ()         // stray RST: standalone
        case _ =>
          if (pos + 2 > b.length) return null
          val len = (((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff)) - 2
          val seg = pos + 2
          if (len < 0 || seg + len > b.length) return null
          m match {
            case 0xdb => // DQT: one or more tables
              var p = seg
              while (p < seg + len) {
                val pq = (b(p) & 0xff) >> 4
                val tq = b(p) & 0x0f
                if (tq > 3 || pq > 1) return null
                p += 1
                val need = if (pq == 0) 64 else 128
                if (p + need > seg + len) return null
                var k = 0
                while (k < 64) {
                  quant(tq)(k) =
                    if (pq == 0) b(p + k) & 0xff
                    else ((b(p + 2 * k) & 0xff) << 8) | (b(p + 2 * k + 1) & 0xff)
                  if (quant(tq)(k) == 0) return null
                  k += 1
                }
                quantSeen(tq) = true
                p += need
              }
            case 0xc4 => // DHT: one or more tables
              var p = seg
              while (p < seg + len) {
                if (p + 17 > seg + len) return null
                val tc = (b(p) & 0xff) >> 4
                val th = b(p) & 0x0f
                if (tc > 1 || th > 3) return null
                val bits = new Array[Int](17)
                var total = 0
                var l = 1
                while (l <= 16) { bits(l) = b(p + l) & 0xff; total += bits(l); l += 1 }
                if (total == 0 || total > 256 || p + 17 + total > seg + len) return null
                val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + total)
                val t = new HuffTable(bits, vals)
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                p += 17 + total
              }
            case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 baseline/extended, SOF2 progressive
              if (sofSeen) return null
              progressive = m == 0xc2
              val prec = b(seg) & 0xff
              if (prec != 8) return null
              height = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
              width = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
              val nf = b(seg + 5) & 0xff
              if (nf != 1 && nf != 3) return null     // gray or YCbCr only
              if (len < 6 + 3 * nf) return null
              comps = Array.fill(nf)(new Component)
              var c = 0
              while (c < nf) {
                val o = seg + 6 + 3 * c
                comps(c).id = b(o) & 0xff
                comps(c).h = (b(o + 1) & 0xff) >> 4
                comps(c).v = b(o + 1) & 0x0f
                comps(c).tq = b(o + 2) & 0xff
                if (comps(c).h < 1 || comps(c).h > 4 ||
                  comps(c).v < 1 || comps(c).v > 4 || comps(c).tq > 3) return null
                c += 1
              }
              sofSeen = true
            case x if (x >= 0xc3 && x <= 0xcf) && x != 0xc4 && x != 0xc8 && x != 0xcc =>
              return null // arithmetic / lossless / hierarchical
            case 0xe1 => // APP1: EXIF orientation, if present and sane
              val o = exifOrientation(b, seg, len)
              if (o >= 1 && o <= 8) orientation = o
            case 0xdd => // DRI: body is the 2-byte restart interval
              if (len < 2) return null
              restartInterval = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
            case 0xda if progressive => // SOS: one of the frame's many scans
              if (!sofSeen) return null
              if (prog == null) {
                prog = ProgState.init(comps, width, height)
                if (prog == null) return null
              }
              val ns = b(seg) & 0xff
              if (ns < 1 || ns > comps.length || len < 4 + 2 * ns) return null
              val scanComps = new Array[Component](ns)
              var c = 0
              while (c < ns) {
                val cs = b(seg + 1 + 2 * c) & 0xff
                val comp = comps.find(_.id == cs).orNull
                if (comp == null) return null
                comp.dcTbl = (b(seg + 2 + 2 * c) & 0xff) >> 4
                comp.acTbl = b(seg + 2 + 2 * c) & 0x0f
                if (comp.dcTbl > 3 || comp.acTbl > 3) return null
                scanComps(c) = comp
                c += 1
              }
              val o = seg + 1 + 2 * ns
              if (o + 3 > b.length) return null
              val ss = b(o) & 0xff
              val se = b(o + 1) & 0xff
              val ah = (b(o + 2) & 0xff) >> 4
              val al = b(o + 2) & 0x0f
              // T.81 G.1: DC scans are Ss=Se=0 (may interleave); AC scans
              // are a single component over 1..63; refinements step one bit
              if (ss > se || se > 63 || ah > 13 || al > 13) return null
              if (ss == 0 && se != 0) return null
              if (ss > 0 && ns != 1) return null
              if (ah != 0 && ah != al + 1) return null
              val entropyStart = seg + len
              if (!progScan(b, entropyStart, prog, comps, scanComps,
                ss, se, ah, al, restartInterval,
                quant, quantSeen, dcTables, acTables)) return null
              // the walk resumes at the next marker (more scans, DHT/DRI
              // updates between them, finally EOI)
              entropySkipTo = entropyEnd(b, entropyStart)

            case 0xda => // SOS — the one scan we decode
              if (!sofSeen) return null
              val ns = b(seg) & 0xff
              if (ns != comps.length) return null     // one full interleaved scan
              var c = 0
              while (c < ns) {
                val cs = b(seg + 1 + 2 * c) & 0xff
                val comp = comps.find(_.id == cs).orNull
                if (comp == null) return null
                comp.dcTbl = (b(seg + 2 + 2 * c) & 0xff) >> 4
                comp.acTbl = b(seg + 2 + 2 * c) & 0x0f
                if (comp.dcTbl > 3 || comp.acTbl > 3) return null
                c += 1
              }
              val o = seg + 1 + 2 * ns
              if (o + 3 > b.length) return null
              // baseline spectral selection: full band, no approximation
              if ((b(o) & 0xff) != 0 || (b(o + 1) & 0xff) != 63 || (b(o + 2) & 0xff) != 0)
                return null
              val g = decodeScan(b, seg + len, comps, width, height,
                quant, quantSeen, dcTables, acTables, restartInterval)
              // EXIF-orientation normalization: a rotation-via-metadata
              // re-encode must hash like its upright original
              val og = orient(g, orientation)
              return if (og == null || og.w < 9 || og.h < 8) null else og
            case _ => () // APPn / COM / anything else: skip
          }
          pos =
            if (entropySkipTo >= 0) { val p = entropySkipTo; entropySkipTo = -1; p }
            else seg + len
      }
    }
    null // no SOS reached
  }

  /** Parse the EXIF Orientation tag (0x0112) out of an APP1 segment: the
    * "Exif\0\0" header, a TIFF header (II/MM byte order, magic 42), and a
    * linear IFD0 scan — sub-IFDs are irrelevant (Orientation lives in
    * IFD0). Every read is bounds-guarded; anything malformed returns -1
    * (caller keeps orientation 1). This is metadata, not pixel data — a
    * parse failure must never fail the decode.
    */
  private def exifOrientation(b: Array[Byte], seg: Int, len: Int): Int = {
    if (len < 14) return -1
    if (b(seg) != 'E' || b(seg + 1) != 'x' || b(seg + 2) != 'i' ||
      b(seg + 3) != 'f' || b(seg + 4) != 0 || b(seg + 5) != 0) return -1
    val t = seg + 6 // TIFF header origin; all offsets are relative to it
    val end = seg + len
    val little =
      if (b(t) == 'I' && b(t + 1) == 'I') true
      else if (b(t) == 'M' && b(t + 1) == 'M') false
      else return -1
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > end) -1
      else if (little) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > end) -1L
      else if (little) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    if (u16(t + 2) != 42) return -1
    val off = u32(t + 4)
    if (off < 0 || off > Int.MaxValue - 8) return -1
    val ifd = t + off.toInt
    val n = u16(ifd)
    if (n < 0 || n > 512) return -1
    var i = 0
    while (i < n) {
      val e = ifd + 2 + 12 * i
      if (u16(e) == 0x0112 && u16(e + 2) == 3) return u16(e + 8)
      i += 1
    }
    -1
  }

  /** Apply an EXIF orientation (2-8: flips / rotations / transposes) to a
    * decoded plane — orientations 5-8 swap the axes. Identity for 1 and
    * anything out of range.
    */
  private def orient(g: PngPixelHash.Gray, o: Int): PngPixelHash.Gray = {
    if (g == null || o <= 1 || o > 8) return g
    val w = g.w; val h = g.h
    val nw = if (o >= 5) h else w
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = g.px(y * w + x)
        // stored (x, y) -> displayed (nx, ny), T.81/EXIF 2.3 semantics
        var nx = 0; var ny = 0
        o match {
          case 2 => nx = w - 1 - x; ny = y              // mirror horizontal
          case 3 => nx = w - 1 - x; ny = h - 1 - y      // rotate 180
          case 4 => nx = x; ny = h - 1 - y              // mirror vertical
          case 5 => nx = y; ny = x                      // transpose
          case 6 => nx = h - 1 - y; ny = x              // rotate 90 CW
          case 7 => nx = h - 1 - y; ny = w - 1 - x      // transverse
          case _ => nx = y; ny = w - 1 - x              // 8: rotate 270 CW
        }
        out(ny * nw + nx) = v
        x += 1
      }
      y += 1
    }
    new PngPixelHash.Gray(out, nw, if (o >= 5) w else h)
  }

  private def decodeScan(
      b: Array[Byte], scanStart: Int, comps: Array[Component],
      width: Int, height: Int,
      quant: Array[Array[Int]], quantSeen: Array[Boolean],
      dcTables: Array[HuffTable], acTables: Array[HuffTable],
      restartInterval: Int): PngPixelHash.Gray = {
    import PngPixelHash.{MaxDim, MaxPixels}
    var hMax = 1; var vMax = 1
    comps.foreach { c => hMax = math.max(hMax, c.h); vMax = math.max(vMax, c.v) }
    comps.foreach { c =>
      if (!quantSeen(c.tq) || dcTables(c.dcTbl) == null || acTables(c.acTbl) == null)
        return null
    }
    val luma = comps(0)
    // component dims at its natural sampling resolution (T.81 A.1.1)
    val lw = (width.toLong * luma.h + hMax - 1) / hMax
    val lh = (height.toLong * luma.v + vMax - 1) / vMax
    if (lw < 9 || lw > MaxDim || lh < 8 || lh > MaxDim) return null
    if (lw * lh > MaxPixels) return null
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // padded luma plane: whole blocks, cropped at the end
    val pw = mcusX * 8 * luma.h
    val ph = mcusY * 8 * luma.v
    if (pw.toLong * ph > 4L * MaxPixels) return null
    val plane = new Array[Int](pw * ph)
    val coef = new Array[Int](64)
    val pixel = new Array[Int](64)
    val r = new BitReader(b, scanStart)
    var rstNext = 0

    def decodeBlock(c: Component, doIdct: Boolean, px0: Int, py0: Int): Boolean = {
      val t = r.decode(dcTables(c.dcTbl))
      if (t < 0 || t > 15) return false
      val diff = r.extend(t)
      if (r.bad) return false
      c.dcPred += diff
      if (!doIdct) {
        // chroma: run the AC stream to advance the reader, discard values
        var k = 1
        while (k < 64) {
          val rs = r.decode(acTables(c.acTbl))
          if (rs < 0) return false
          val run = rs >> 4; val size = rs & 0x0f
          if (size == 0) {
            if (run == 15) k += 16 else k = 64 // ZRL / EOB
          } else {
            k += run
            if (k > 63) return false
            r.extend(size)
            if (r.bad) return false
            k += 1
          }
        }
        return true
      }
      val q = quant(c.tq)
      java.util.Arrays.fill(coef, 0)
      coef(0) = c.dcPred * q(0)
      var k = 1
      while (k < 64) {
        val rs = r.decode(acTables(c.acTbl))
        if (rs < 0) return false
        val run = rs >> 4; val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) k += 16 else k = 64
        } else {
          k += run
          if (k > 63) return false
          coef(ZigZag(k)) = r.extend(size) * q(k)
          if (r.bad) return false
          k += 1
        }
      }
      idctIslow(coef, pixel)
      // place the 8x8 samples (clamped into [0,255] by the IDCT)
      var y = 0
      while (y < 8) {
        val row = (py0 + y) * pw + px0
        var x = 0
        while (x < 8) { plane(row + x) = pixel(y * 8 + x); x += 1 }
        y += 1
      }
      true
    }

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align and consume the expected RSTn, reset DC predictors.
        // `pos` points at the first byte the reader never pulled: between
        // it and the marker sit at most the final padding byte (possibly
        // stuffed) plus optional fill FFs — scan a short bounded window.
        r.align()
        var p = r.pos
        val limit = math.min(b.length - 1, p + 4)
        while (p < limit &&
          !((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == (0xd0 + rstNext)))
          p += 1
        if (p >= limit &&
          !(p + 1 < b.length && (b(p) & 0xff) == 0xff &&
            (b(p + 1) & 0xff) == (0xd0 + rstNext))) return null
        r.resume(p + 2)
        rstNext = (rstNext + 1) & 7
        comps.foreach(_.dcPred = 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var c = 0
      while (c < comps.length) {
        val comp = comps(c)
        val isLuma = c == 0
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            val px0 = (mx * comp.h + bx) * 8
            val py0 = (my * comp.v + by) * 8
            if (!decodeBlock(comp, isLuma, px0, py0)) return null
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    // crop the padded plane to the luma component's natural dims
    val w = lw.toInt; val h = lh.toInt
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(plane, y * pw, px, y * w, w)
      y += 1
    }
    new PngPixelHash.Gray(px, w, h)
  }

  // ---- progressive (SOF2) decode ------------------------------------
  // Multi-scan coefficient accumulation per ITU T.81 Annex G: spectral
  // selection (each AC scan carries one zigzag band of ONE component)
  // and successive approximation (first scans deliver coefficients at
  // reduced precision Al, refinement scans append one bit each). Only
  // the LUMA plane's coefficients are stored (the dHash contract —
  // chroma scans advance the entropy stream or are skipped whole);
  // dequantization + IDCT run once, at EOI, over the accumulated
  // coefficients — exactly the samples a baseline re-encode of the same
  // coefficients produces, so progressive↔baseline twins land at
  // Hamming 0 (JpegSpec).

  /** Accumulated progressive state: the luma coefficient store in ZIGZAG
    * order per block on the PADDED MCU grid (interleaved DC scans cover
    * padding blocks; non-interleaved AC scans cover the real grid only),
    * plus the per-scan EOB-run register.
    */
  private final class ProgState(
      val lumaBlocksW: Int, val lumaBlocksH: Int,
      val realBlocksW: Int, val realBlocksH: Int,
      val mcusX: Int, val mcusY: Int,
      val hMax: Int, val vMax: Int,
      val lw: Int, val lh: Int) {
    val coef = new Array[Int](lumaBlocksW * lumaBlocksH * 64)
    var eobrun = 0
    var sawScan = false
  }

  private object ProgState {
    def init(comps: Array[Component], width: Int, height: Int): ProgState = {
      import PngPixelHash.{MaxDim, MaxPixels}
      var hMax = 1; var vMax = 1
      comps.foreach { c => hMax = math.max(hMax, c.h); vMax = math.max(vMax, c.v) }
      val luma = comps(0)
      val lw = (width.toLong * luma.h + hMax - 1) / hMax
      val lh = (height.toLong * luma.v + vMax - 1) / vMax
      if (lw < 9 || lw > MaxDim || lh < 8 || lh > MaxDim) return null
      if (lw * lh > MaxPixels) return null
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      val bw = mcusX * luma.h
      val bh = mcusY * luma.v
      if (bw.toLong * bh * 64 > 8L * MaxPixels) return null
      new ProgState(bw, bh,
        ((lw + 7) / 8).toInt, ((lh + 7) / 8).toInt,
        mcusX, mcusY, hMax, vMax, lw.toInt, lh.toInt)
    }
  }

  /** First raw index at/after `from` holding a real marker (FF followed
    * by neither a stuffed 00 nor an RSTn) — the end of a scan's entropy
    * segment, found WITHOUT decoding (skipped chroma scans).
    */
  private def entropyEnd(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < b.length) {
      if ((b(p) & 0xff) == 0xff) {
        val nx = b(p + 1) & 0xff
        if (nx != 0x00 && !(nx >= 0xd0 && nx <= 0xd7)) return p
        p += 2
      } else p += 1
    }
    b.length
  }

  /** Decode one progressive scan into the accumulated state. Returns
    * false on anything unclean. Scans of non-luma components that don't
    * interleave with luma are SKIPPED (the caller advances by
    * [[entropyEnd]] — entropy data never contains a bare marker).
    */
  private def progScan(
      b: Array[Byte], entropyStart: Int, st: ProgState,
      comps: Array[Component], scanComps: Array[Component],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int,
      quant: Array[Array[Int]], quantSeen: Array[Boolean],
      dcTables: Array[HuffTable], acTables: Array[HuffTable]): Boolean = {
    val luma = comps(0)
    st.eobrun = 0
    st.sawScan = true
    // single-component scan of a component we don't store: skip whole
    if (scanComps.length == 1 && (scanComps(0) ne luma)) return true
    val r = new BitReader(b, entropyStart)
    var rstNext = 0
    scanComps.foreach(_.dcPred = 0)

    def restart(mcu: Int): Boolean = {
      if (restartInterval == 0 || mcu == 0 || mcu % restartInterval != 0) return true
      r.align()
      var p = r.pos
      val limit = math.min(b.length - 1, p + 4)
      while (p < limit &&
        !((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == (0xd0 + rstNext)))
        p += 1
      if (!(p + 1 < b.length && (b(p) & 0xff) == 0xff &&
        (b(p + 1) & 0xff) == (0xd0 + rstNext))) return false
      r.resume(p + 2)
      rstNext = (rstNext + 1) & 7
      scanComps.foreach(_.dcPred = 0)
      st.eobrun = 0
      true
    }

    if (ss == 0) {
      // ---- DC scan (interleaved or single-component) ----
      if (ah == 0 && scanComps.exists(c => dcTables(c.dcTbl) == null)) return false
      // geometry: interleaved scans walk the frame MCU grid; a
      // single-component scan walks that component's real block grid
      val interleaved = scanComps.length > 1
      val (mcusX, mcusY) =
        if (interleaved) (st.mcusX, st.mcusY)
        else {
          val c = scanComps(0)
          (((st.lw.toLong * c.h / luma.h + 7) / 8).toInt, // == real blocks for luma
            ((st.lh.toLong * c.v / luma.v + 7) / 8).toInt)
        }
      val nonLumaOnly = !scanComps.contains(luma)
      if (nonLumaOnly) return true // single-comp chroma DC: skipped above; Ns>1 w/o luma: nothing stored but stream must advance... decode anyway
      var mcu = 0
      val total = mcusX * mcusY
      while (mcu < total) {
        if (!restart(mcu)) return false
        val mx = mcu % mcusX; val my = mcu / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          val isLuma = c eq luma
          val (hh, vv) = if (interleaved) (c.h, c.v) else (1, 1)
          var by = 0
          while (by < vv) {
            var bx = 0
            while (bx < hh) {
              val bxx = if (interleaved) mx * c.h + bx else mx
              val byy = if (interleaved) my * c.v + by else my
              if (ah == 0) {
                val t = r.decode(dcTables(c.dcTbl))
                if (t < 0 || t > 15) return false
                val diff = r.extend(t)
                if (r.bad) return false
                c.dcPred += diff
                if (isLuma)
                  st.coef((byy * st.lumaBlocksW + bxx) * 64) = c.dcPred << al
              } else {
                val bit = r.bit()
                if (bit < 0) return false
                if (isLuma && bit == 1)
                  st.coef((byy * st.lumaBlocksW + bxx) * 64) |= (1 << al)
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      true
    } else {
      // ---- AC scan: single component == luma (others skipped above) ----
      val c = scanComps(0)
      if (acTables(c.acTbl) == null) return false
      val p1 = 1 << al
      val m1 = -1 << al
      val bw = st.realBlocksW
      val bh = st.realBlocksH
      var blk = 0
      val total = bw * bh
      while (blk < total) {
        if (!restart(blk)) return false
        val bi = ((blk / bw) * st.lumaBlocksW + (blk % bw)) * 64
        if (ah == 0) {
          // first scan of this band at this precision (T.81 G.1.2.2)
          if (st.eobrun > 0) st.eobrun -= 1
          else {
            var k = ss
            var done = false
            while (k <= se && !done) {
              val rs = r.decode(acTables(c.acTbl))
              if (rs < 0) return false
              val run = rs >> 4; val size = rs & 0x0f
              if (size == 0) {
                if (run < 15) {
                  st.eobrun = (1 << run) - 1
                  if (run > 0) {
                    val extra = r.bits(run)
                    if (extra < 0) return false
                    st.eobrun += extra
                  }
                  done = true
                } else k += 16 // ZRL
              } else {
                k += run
                if (k > se) return false
                st.coef(bi + k) = r.extend(size) << al
                if (r.bad) return false
                k += 1
              }
            }
          }
        } else {
          // refinement (T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine):
          // newly-significant coefficients arrive as ±1<<Al; every
          // nonzero coefficient passed over contributes one correction bit
          var k = ss
          if (st.eobrun == 0) {
            var inBlock = true
            while (k <= se && inBlock) {
              val rs = r.decode(acTables(c.acTbl))
              if (rs < 0) return false
              var run = rs >> 4; val size = rs & 0x0f
              var newval = 0
              if (size == 0) {
                if (run < 15) {
                  // refinement EOB-run counts the CURRENT block too: its
                  // band tail still carries correction bits (the tail
                  // loop below runs, then decrements) — T.81 G.1.2.3 /
                  // libjpeg's EOBRUN = 1 << r
                  st.eobrun = 1 << run
                  if (run > 0) {
                    val extra = r.bits(run)
                    if (extra < 0) return false
                    st.eobrun += extra
                  }
                  inBlock = false // remaining band handled by the EOB branch
                }
                // run == 15: ZRL — skip 16 zero-history coefficients
              } else {
                if (size != 1) return false // refinement codes only ±1
                val sgn = r.bit()
                if (sgn < 0) return false
                newval = if (sgn == 1) p1 else m1
              }
              if (inBlock) {
                var seek = true
                while (k <= se && seek) {
                  val v = st.coef(bi + k)
                  if (v != 0) {
                    val cb = r.bit()
                    if (cb < 0) return false
                    if (cb == 1 && (v & p1) == 0)
                      st.coef(bi + k) = v + (if (v >= 0) p1 else m1)
                  } else {
                    if (run == 0) seek = false
                    else run -= 1
                  }
                  if (seek) k += 1
                }
                if (newval != 0 && k <= se) st.coef(bi + k) = newval
                k += 1
              }
            }
          }
          if (st.eobrun > 0) {
            // EOB region: correction bits for the band's remaining
            // nonzero coefficients only
            while (k <= se) {
              val v = st.coef(bi + k)
              if (v != 0) {
                val cb = r.bit()
                if (cb < 0) return false
                if (cb == 1 && (v & p1) == 0)
                  st.coef(bi + k) = v + (if (v >= 0) p1 else m1)
              }
              k += 1
            }
            st.eobrun -= 1
          }
        }
        blk += 1
      }
      true
    }
  }

  /** Dequantize + IDCT the accumulated luma coefficients, crop to the
    * component's natural dims.
    */
  private def finishProgressive(
      st: ProgState, comps: Array[Component],
      quant: Array[Array[Int]], quantSeen: Array[Boolean]): PngPixelHash.Gray = {
    if (st == null || !st.sawScan) return null
    val luma = comps(0)
    if (!quantSeen(luma.tq)) return null
    val q = quant(luma.tq)
    val pw = st.lumaBlocksW * 8
    val coefNat = new Array[Int](64)
    val pixel = new Array[Int](64)
    val plane = new Array[Int](pw * st.lumaBlocksH * 8)
    var by = 0
    while (by < st.realBlocksH) {
      var bx = 0
      while (bx < st.realBlocksW) {
        val bi = (by * st.lumaBlocksW + bx) * 64
        java.util.Arrays.fill(coefNat, 0)
        var k = 0
        while (k < 64) {
          coefNat(ZigZag(k)) = st.coef(bi + k) * q(k)
          k += 1
        }
        idctIslow(coefNat, pixel)
        var y = 0
        while (y < 8) {
          val row = (by * 8 + y) * pw + bx * 8
          var x = 0
          while (x < 8) { plane(row + x) = pixel(y * 8 + x); x += 1 }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    val px = new Array[Int](st.lw * st.lh)
    var y = 0
    while (y < st.lh) {
      System.arraycopy(plane, y * pw, px, y * st.lw, st.lw)
      y += 1
    }
    new PngPixelHash.Gray(px, st.lw, st.lh)
  }

  // ---- fixed-point integer IDCT -------------------------------------
  // The Loeffler-Ligtenberg-Moshovitz 1989 factorization in 13-bit fixed
  // point (CONST_BITS = 13, PASS1_BITS = 2) — the exact-integer "islow"
  // arithmetic every libjpeg-lineage decoder uses, so the reconstruction
  // is bit-reproducible across engines and architectures. All Long
  // intermediates: coefficients are <= 2047 * 65535 after dequant, far
  // inside 64-bit at 13 fractional bits.

  private final val ConstBits = 13
  private final val Pass1Bits = 2
  private final val F_0_298631336 = 2446L
  private final val F_0_390180644 = 3196L
  private final val F_0_541196100 = 4433L
  private final val F_0_765366865 = 6270L
  private final val F_0_899976223 = 7373L
  private final val F_1_175875602 = 9633L
  private final val F_1_501321110 = 12299L
  private final val F_1_847759065 = 15137L
  private final val F_1_961570560 = 16069L
  private final val F_2_053119869 = 16819L
  private final val F_2_562915447 = 20995L
  private final val F_3_072711026 = 25172L

  @inline private def descale(x: Long, n: Int): Long = (x + (1L << (n - 1))) >> n

  @inline private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** in: 64 dequantized coefficients (natural order); out: 64 samples in
    * [0, 255] (level shift +128 applied).
    */
  private[expressions] def idctIslow(in: Array[Int], out: Array[Int]): Unit = {
    val ws = new Array[Long](64)
    // pass 1: columns, results scaled up by PASS1_BITS
    var col = 0
    while (col < 8) {
      if (in(8 + col) == 0 && in(16 + col) == 0 && in(24 + col) == 0 &&
        in(32 + col) == 0 && in(40 + col) == 0 && in(48 + col) == 0 &&
        in(56 + col) == 0) {
        val dc = in(col).toLong << Pass1Bits
        var i = 0
        while (i < 8) { ws(i * 8 + col) = dc; i += 1 }
      } else {
        var z2 = in(16 + col).toLong
        var z3 = in(48 + col).toLong
        var z1 = (z2 + z3) * F_0_541196100
        val t2 = z1 - z3 * F_1_847759065
        val t3 = z1 + z2 * F_0_765366865
        z2 = in(col).toLong
        z3 = in(32 + col).toLong
        val t0 = (z2 + z3) << ConstBits
        val t1 = (z2 - z3) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = in(56 + col).toLong
        var o1 = in(40 + col).toLong
        var o2 = in(24 + col).toLong
        var o3 = in(8 + col).toLong
        z1 = o0 + o3
        z2 = o1 + o2
        var zc = o0 + o2
        var zd = o1 + o3
        val z5 = (zc + zd) * F_1_175875602
        o0 *= F_0_298631336
        o1 *= F_2_053119869
        o2 *= F_3_072711026
        o3 *= F_1_501321110
        z1 *= -F_0_899976223
        z2 *= -F_2_562915447
        zc = zc * -F_1_961570560 + z5
        zd = zd * -F_0_390180644 + z5
        o0 += z1 + zc
        o1 += z2 + zd
        o2 += z2 + zc
        o3 += z1 + zd
        ws(col) = descale(t10 + o3, ConstBits - Pass1Bits)
        ws(56 + col) = descale(t10 - o3, ConstBits - Pass1Bits)
        ws(8 + col) = descale(t11 + o2, ConstBits - Pass1Bits)
        ws(48 + col) = descale(t11 - o2, ConstBits - Pass1Bits)
        ws(16 + col) = descale(t12 + o1, ConstBits - Pass1Bits)
        ws(40 + col) = descale(t12 - o1, ConstBits - Pass1Bits)
        ws(24 + col) = descale(t13 + o0, ConstBits - Pass1Bits)
        ws(32 + col) = descale(t13 - o0, ConstBits - Pass1Bits)
      }
      col += 1
    }
    // pass 2: rows, final descale by CONST_BITS + PASS1_BITS + 3, +128
    var row = 0
    while (row < 8) {
      val o = row * 8
      var z2 = ws(o + 2)
      var z3 = ws(o + 6)
      var z1 = (z2 + z3) * F_0_541196100
      val t2 = z1 - z3 * F_1_847759065
      val t3 = z1 + z2 * F_0_765366865
      z2 = ws(o)
      z3 = ws(o + 4)
      val t0 = (z2 + z3) << ConstBits
      val t1 = (z2 - z3) << ConstBits
      val t10 = t0 + t3; val t13 = t0 - t3
      val t11 = t1 + t2; val t12 = t1 - t2
      var o0 = ws(o + 7)
      var o1 = ws(o + 5)
      var o2 = ws(o + 3)
      var o3 = ws(o + 1)
      z1 = o0 + o3
      z2 = o1 + o2
      var zc = o0 + o2
      var zd = o1 + o3
      val z5 = (zc + zd) * F_1_175875602
      o0 *= F_0_298631336
      o1 *= F_2_053119869
      o2 *= F_3_072711026
      o3 *= F_1_501321110
      z1 *= -F_0_899976223
      z2 *= -F_2_562915447
      zc = zc * -F_1_961570560 + z5
      zd = zd * -F_0_390180644 + z5
      o0 += z1 + zc
      o1 += z2 + zd
      o2 += z2 + zc
      o3 += z1 + zd
      val sh = ConstBits + Pass1Bits + 3
      out(o) = clamp255(descale(t10 + o3, sh) + 128)
      out(o + 7) = clamp255(descale(t10 - o3, sh) + 128)
      out(o + 1) = clamp255(descale(t11 + o2, sh) + 128)
      out(o + 6) = clamp255(descale(t11 - o2, sh) + 128)
      out(o + 2) = clamp255(descale(t12 + o1, sh) + 128)
      out(o + 5) = clamp255(descale(t12 - o1, sh) + 128)
      out(o + 3) = clamp255(descale(t13 + o0, sh) + 128)
      out(o + 4) = clamp255(descale(t13 - o0, sh) + 128)
      row += 1
    }
  }
}
