package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** CONTENT-LEVEL fingerprint for FLAC payloads — the lossless-audio leg
  * of the content family: a native FLAC decode (metadata-block walk,
  * frame headers with UTF-8-coded frame numbers, CONSTANT / VERBATIM /
  * FIXED(0-4) / LPC(1-32) subframes, Rice and Rice2 residuals incl.
  * escape partitions, wasted bits, left-side / right-side / mid-side
  * stereo decorrelation) to the integer PCM stream, mixed down and
  * scaled to the 16-bit domain, then the SAME trim + 65-window envelope
  * gradient as [[WavContentHash]] — so a FLAC encode of a WAV (the
  * cross-CONTAINER duplicate class: the archive keeps .flac, the crawl
  * serves .wav, identical samples) hashes at Hamming EXACTLY 0 against
  * the WAV original. FLAC is integer-exact by spec (Rice residuals over
  * fixed/LPC integer predictors), which is what makes the cross-format
  * guarantee EXACT rather than approximate.
  *
  * Returns NULL for anything not cleanly decodable: bad magic, torn
  * metadata or frames, reserved subframe types, invalid residual
  * methods, >2 channels, bit depths other than 8/16/20/24, or fewer
  * than 65 post-trim samples — never throws (FlacSpec fuzzes). MP3/AAC
  * (lossy, decoder-dependent output) stay DOCUMENTED-UNSUPPORTED on the
  * byte-level [[BlockHash64]] family, the progressive-JPEG precedent.
  *
  * Scale: one codegen'd projection; payloads never shuffle — only the
  * 8-byte hash flows into the banded pair machinery.
  */
case class FlacContentHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_content_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    FlacContentHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("flacContentHashImpl", FlacContentHash,
        FlacContentHash.getClass.getName)
      val tmp = ctx.freshName("fch")
      s"""
        |java.lang.Long $tmp = $impl.hash($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp.longValue(); }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacContentHash =
    copy(child = newChild)
}

object FlacContentHash {

  /** Decoded-sample ceiling (mono frames): bounds transient memory. */
  val MaxSamples: Int = 1 << 24

  private object Bad extends RuntimeException with scala.util.control.NoStackTrace
  private def bad(): Nothing = throw Bad

  /** MSB-first bit reader (FLAC is a big-endian bitstream). */
  private final class Br(b: Array[Byte], var pos: Int, val end: Int) {
    private var bitBuf = 0L
    private var bitCnt = 0
    def bits(n: Int): Int = {
      require(n <= 32)
      while (bitCnt < n) {
        if (pos >= end) bad()
        bitBuf = (bitBuf << 8) | (b(pos) & 0xffL)
        pos += 1; bitCnt += 8
      }
      val v = ((bitBuf >>> (bitCnt - n)) & ((1L << n) - 1)).toInt
      bitCnt -= n
      v
    }
    def signed(n: Int): Int = {
      val v = bits(n)
      (v << (32 - n)) >> (32 - n) // sign-extend
    }
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0) { q += 1; if (q > (1 << 20)) bad() }
      q
    }
    def alignByte(): Unit = { bitCnt -= bitCnt % 8 }
    def atEnd: Boolean = pos >= end && bitCnt < 8
  }

  def hash(b: Array[Byte]): java.lang.Long = {
    val s = decodeMono16(b)
    if (s == null) null else WavContentHash.envelope(s)
  }

  /** Full decode to a mono 16-bit-domain sample run, or null on anything
    * unclean. Never throws.
    */
  private[expressions] def decodeMono16(b: Array[Byte]): Array[Int] =
    try decodeImpl(b)
    catch { case Bad => null; case scala.util.control.NonFatal(_) => null }

  private def decodeImpl(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 42) return null // magic + STREAMINFO header
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return null
    var pos = 4
    var siChannels = -1
    var siBits = -1
    var siTotal = -1L
    var last = false
    var seenStreaminfo = false
    while (!last) {
      if (pos + 4 > b.length) return null
      val h = b(pos) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((b(pos + 1) & 0xff) << 16) | ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      pos += 4
      if (pos + len > b.length) return null
      if (typ == 0) { // STREAMINFO
        if (len != 34 || seenStreaminfo) return null
        seenStreaminfo = true
        val br = new Br(b, pos, pos + len)
        br.bits(16); br.bits(16) // min/max block size
        br.bits(24); br.bits(24) // min/max frame size
        br.bits(20) // sample rate
        siChannels = br.bits(3) + 1
        siBits = br.bits(5) + 1
        siTotal = (br.bits(4).toLong << 32) | (br.bits(32).toLong & 0xffffffffL)
      } else if (typ == 127) return null // invalid block type
      pos += len
    }
    if (!seenStreaminfo) return null
    if (siChannels < 1 || siChannels > 2) return null // >2ch keeps BlockHash64
    if (siBits != 8 && siBits != 16 && siBits != 20 && siBits != 24) return null
    if (siTotal <= 0 || siTotal > MaxSamples) return null
    val out = new Array[Int](siTotal.toInt)
    var got = 0
    val br = new Br(b, pos, b.length)
    while (got < siTotal) {
      // frame header
      val sync = br.bits(14)
      if (sync != 0x3ffe) bad()
      if (br.bits(1) != 0) bad() // reserved
      br.bits(1) // blocking strategy
      val bsCode = br.bits(4)
      val srCode = br.bits(4)
      val chanAsgn = br.bits(4)
      val ssCode = br.bits(3)
      if (br.bits(1) != 0) bad() // reserved
      // UTF-8 coded frame/sample number (consume; up to 7 bytes)
      val first = br.bits(8)
      var follow =
        if (first < 0x80) 0
        else if ((first & 0xe0) == 0xc0) 1
        else if ((first & 0xf0) == 0xe0) 2
        else if ((first & 0xf8) == 0xf0) 3
        else if ((first & 0xfc) == 0xf8) 4
        else if ((first & 0xfe) == 0xfc) 5
        else if (first == 0xfe) 6
        else bad()
      while (follow > 0) {
        if ((br.bits(8) & 0xc0) != 0x80) bad()
        follow -= 1
      }
      val blockSize = bsCode match {
        case 0 => bad()
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => br.bits(8) + 1
        case 7 => br.bits(16) + 1
        case n => 256 << (n - 8)
      }
      srCode match { // rate value unused; variable-length forms consume bits
        case 12 => br.bits(8)
        case 13 | 14 => br.bits(16)
        case 15 => bad()
        case _ => ()
      }
      val bps = ssCode match {
        case 0 => siBits
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case _ => bad()
      }
      br.bits(8) // header CRC-8 (content identity, not integrity)
      if (chanAsgn > 10) bad() // reserved channel assignments
      val channels = if (chanAsgn <= 7) chanAsgn + 1 else 2
      if (channels != siChannels) bad()
      if (blockSize <= 0 || got + blockSize > siTotal) bad()
      // subframes
      val ch = Array.ofDim[Int](channels, blockSize)
      var c = 0
      while (c < channels) {
        // the SIDE channel carries one extra bit
        val extra = chanAsgn match {
          case 8 => if (c == 1) 1 else 0 // left/side
          case 9 => if (c == 0) 1 else 0 // side/right
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        decodeSubframe(br, ch(c), blockSize, bps + extra)
        c += 1
      }
      br.alignByte()
      br.bits(16) // frame CRC-16 (not validated)
      // stereo decorrelation + mixdown
      val scale = bps match { case 8 => 8; case 12 => 4; case 16 => 0; case 20 => -4; case 24 => -8 }
      var i = 0
      if (channels == 1) {
        while (i < blockSize) { out(got + i) = to16(ch(0)(i), scale); i += 1 }
      } else {
        while (i < blockSize) {
          val (l, r) = chanAsgn match {
            case 8 => (ch(0)(i), ch(0)(i) - ch(1)(i)) // left/side
            case 9 => (ch(0)(i) + ch(1)(i), ch(1)(i)) // side/right
            case 10 => // mid/side
              val side = ch(1)(i)
              val mid2 = (ch(0)(i) << 1) | (side & 1)
              ((mid2 + side) >> 1, (mid2 - side) >> 1)
            case _ => (ch(0)(i), ch(1)(i))
          }
          out(got + i) = to16((l + r) >> 1, scale)
          i += 1
        }
      }
      got += blockSize
    }
    out
  }

  /** Scale a decoded sample into the 16-bit domain (positive scale =
    * shift up, negative = shift down) so 8/20/24-bit encodes of the same
    * signal land on the same envelope as their 16-bit WAV twin.
    */
  private def to16(v: Int, scale: Int): Int =
    if (scale >= 0) v << scale else v >> -scale

  private def decodeSubframe(br: Br, out: Array[Int], blockSize: Int, bps: Int): Unit = {
    if (br.bits(1) != 0) bad() // zero pad bit
    val typ = br.bits(6)
    val wastedFlag = br.bits(1)
    val wasted = if (wastedFlag == 1) br.unary() + 1 else 0
    val eff = bps - wasted
    if (eff <= 0 || eff > 32) bad()
    if (typ == 0) { // CONSTANT
      val v = br.signed(eff)
      java.util.Arrays.fill(out, 0, blockSize, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = br.signed(eff); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
      val order = typ & 0x07
      var i = 0
      while (i < order) { out(i) = br.signed(eff); i += 1 }
      decodeResidual(br, out, blockSize, order)
      i = order
      while (i < blockSize) {
        val p = order match {
          case 0 => 0L
          case 1 => out(i - 1).toLong
          case 2 => 2L * out(i - 1) - out(i - 2)
          case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
          case 4 => 4L * out(i - 1) - 6L * out(i - 2) + 4L * out(i - 3) - out(i - 4)
        }
        out(i) = (out(i) + p).toInt
        i += 1
      }
    } else if ((typ & 0x20) != 0) { // LPC
      val order = (typ & 0x1f) + 1
      if (order > blockSize) bad()
      var i = 0
      while (i < order) { out(i) = br.signed(eff); i += 1 }
      val precision = br.bits(4) + 1
      if (precision == 16) bad() // 1111 is invalid
      val shift = {
        val s = br.bits(5)
        (s << 27) >> 27 // signed 5-bit; negative shifts are invalid
      }
      if (shift < 0) bad()
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.signed(precision); i += 1 }
      decodeResidual(br, out, blockSize, order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = (out(i) + (acc >> shift)).toInt
        i += 1
      }
    } else bad() // reserved subframe types
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
  }

  /** Rice/Rice2 residual into `out(order until blockSize)`. */
  private def decodeResidual(br: Br, out: Array[Int], blockSize: Int, order: Int): Unit = {
    val method = br.bits(2)
    if (method > 1) bad()
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val po = br.bits(4)
    val partitions = 1 << po
    if (blockSize % partitions != 0) bad()
    val perPart = blockSize >> po
    if (perPart <= order && partitions == 1) bad()
    var i = order
    var part = 0
    while (part < partitions) {
      val count = if (part == 0) perPart - order else perPart
      if (count < 0) bad()
      val param = br.bits(paramBits)
      if (param == escape) {
        val raw = br.bits(5)
        var k = 0
        while (k < count) {
          out(i) = if (raw == 0) 0 else br.signed(raw)
          i += 1; k += 1
        }
      } else {
        var k = 0
        while (k < count) {
          val q = br.unary()
          val u = (q.toLong << param) | (if (param > 0) br.bits(param).toLong & ((1L << param) - 1) else 0L)
          val v = ((u >>> 1) ^ -(u & 1L)).toInt // zigzag
          out(i) = v
          i += 1; k += 1
        }
      }
      part += 1
    }
  }
}
