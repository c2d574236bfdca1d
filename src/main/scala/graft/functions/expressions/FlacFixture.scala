package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic synthetic FLAC generator — the lossless-audio twin of
  * [[WavFixture]] (it encodes the SAME [[WavFixture.samples]] signal, so
  * the WAV base and the FLAC encode are the cross-container duplicate
  * pair). Every payload is a REAL FLAC stream: fLaC magic, STREAMINFO,
  * byte-aligned frames with spec CRC-8 headers and CRC-16 footers,
  * UTF-8-coded frame numbers, and a MIX of subframe types across frames
  * (VERBATIM, FIXED order 1/2, LPC order 2, CONSTANT for the all-zero
  * side channel) with single-partition Rice residuals — exercising the
  * decode paths [[FlacContentHash]] must get integer-exact.
  *
  * Variants (`mode`):
  *  - `flac`      — mono 16-bit encode of the signal (the archive's
  *                  lossless master of the crawl's WAV).
  *  - `ms`        — the signal duplicated to stereo, stored MID/SIDE
  *                  (side is constant 0 — the duplicated-channel case).
  *  - `ls`        — the same duplicated stereo stored LEFT/SIDE.
  *  - `truncated` — `flac` torn mid-frame (must decode NULL).
  *  - `garbage`   — not FLAC at all.
  */
case class SyntheticFlac(child: Expression, mode: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_synthetic_flac"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if FlacFixture.Modes.contains(mode) => TypeCheckSuccess
    case LongType => TypeCheckFailure(
      s"$prettyName: unknown mode '$mode' (expected one of ${FlacFixture.Modes.mkString(", ")})")
    case dt => TypeCheckFailure(
      s"$prettyName requires a long id argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    FlacFixture.build(input.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = s"${FlacFixture.getClass.getName.stripSuffix("$")}$$.MODULE$$"
      s"${ev.value} = $impl.build($v, \"$mode\");"
    })

  override protected def withNewChildInternal(newChild: Expression): SyntheticFlac =
    copy(child = newChild)
}

object FlacFixture {

  val Modes: Set[String] = Set("flac", "ms", "ls", "truncated", "garbage")

  private final val BlockSize = 576

  /** MSB-first bit writer with byte-range access for the frame CRCs. */
  private final class Bw {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def byteAligned: Boolean = nb == 0
    def size: Int = buf.size
    def slice(from: Int): Array[Byte] = buf.slice(from, buf.size).toArray
    def bytes: Array[Byte] = { require(nb == 0, "unaligned stream"); buf.toArray }
  }

  private def crc8(b: Array[Byte]): Int = {
    var crc = 0
    b.foreach { x =>
      crc ^= (x & 0xff)
      var i = 0
      while (i < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        i += 1
      }
    }
    crc
  }

  private def crc16(b: Array[Byte]): Int = {
    var crc = 0
    b.foreach { x =>
      crc ^= (x & 0xff) << 8
      var i = 0
      while (i < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff
        i += 1
      }
    }
    crc
  }

  def build(id: Long, mode: String): Array[Byte] = mode match {
    case "flac" => encode(WavFixture.samples(id), stereo = None)
    case "ms" => encode(WavFixture.samples(id), stereo = Some(10))
    case "ls" => encode(WavFixture.samples(id), stereo = Some(8))
    case "truncated" =>
      val full = build(id, "flac")
      java.util.Arrays.copyOfRange(full, 0, full.length * 2 / 3)
    case "garbage" =>
      java.security.MessageDigest.getInstance("MD5").digest(s"$id|flacjunk".getBytes("UTF-8"))
    case other => throw new IllegalArgumentException(s"synthetic_flac: unknown mode '$other'")
  }

  /** Encode the mono 16-bit signal; `stereo` = Some(chanAsgn 8|10)
    * duplicates it to two channels stored with that decorrelation (the
    * side channel is constant 0).
    */
  private def encode(signal: Array[Int], stereo: Option[Int]): Array[Byte] = {
    val bw = new Bw
    val channels = if (stereo.isDefined) 2 else 1
    // magic + STREAMINFO (last metadata block)
    bw.bits(0x664c6143L, 32) // "fLaC"
    bw.bits(0x80, 8); bw.bits(34, 24) // last=1, type=0, len=34
    bw.bits(BlockSize, 16); bw.bits(BlockSize, 16)
    bw.bits(0, 24); bw.bits(0, 24) // frame sizes unknown
    bw.bits(8000, 20)
    bw.bits(channels - 1, 3)
    bw.bits(15, 5) // 16-bit
    bw.bits(0, 4); bw.bits(signal.length.toLong, 32) // total samples (36 bits)
    (0 until 16).foreach(_ => bw.bits(0, 8)) // md5 unset
    var off = 0
    var frame = 0
    while (off < signal.length) {
      val bs = math.min(BlockSize, signal.length - off)
      val start = bw.size
      // ---- frame header
      bw.bits(0x3ffe, 14); bw.bits(0, 1); bw.bits(0, 1) // sync, reserved, fixed blocking
      val bsCode = if (bs == BlockSize) 2 else 7 // 576, else 16-bit-1 field
      bw.bits(bsCode, 4)
      bw.bits(4, 4) // 8 kHz
      bw.bits(stereo.getOrElse(0).toLong, 4)
      bw.bits(4, 3); bw.bits(0, 1) // 16-bit, reserved
      require(frame < 128, "fixture frames fit one UTF-8 byte")
      bw.bits(frame, 8)
      if (bsCode == 7) bw.bits(bs - 1, 16)
      bw.bits(crc8(bw.slice(start)), 8)
      // ---- subframes: vary the type per frame to exercise the decoder
      val block = java.util.Arrays.copyOfRange(signal, off, off + bs)
      def mainSubframe(bps: Int): Unit = (frame % 4) match {
        case 0 => writeVerbatim(bw, block, bps)
        case 1 => writeFixed(bw, block, bps, order = 2)
        case 2 => writeLpc(bw, block, bps)
        case _ => writeFixed(bw, block, bps, order = 1)
      }
      stereo match {
        case None => mainSubframe(16)
        case Some(10) => // MID/SIDE: mid = signal (L=R), side = 0
          mainSubframe(16)
          writeConstant(bw, 0, 17)
        case Some(8) => // LEFT/SIDE: left = signal, side = 0
          mainSubframe(16)
          writeConstant(bw, 0, 17)
        case Some(other) =>
          throw new IllegalArgumentException(s"unsupported stereo mode $other")
      }
      // ---- footer: align, CRC-16 over the whole frame
      while (!bw.byteAligned) bw.bits(0, 1)
      bw.bits(crc16(bw.slice(start)), 16)
      off += bs
      frame += 1
    }
    bw.bytes
  }

  private def subframeHeader(bw: Bw, typ: Int): Unit = {
    bw.bits(0, 1) // pad
    bw.bits(typ, 6)
    bw.bits(0, 1) // no wasted bits
  }

  private def writeConstant(bw: Bw, v: Int, bps: Int): Unit = {
    subframeHeader(bw, 0)
    bw.bits(v.toLong & ((1L << bps) - 1), bps)
  }

  private def writeVerbatim(bw: Bw, block: Array[Int], bps: Int): Unit = {
    subframeHeader(bw, 1)
    block.foreach(s => bw.bits(s.toLong & ((1L << bps) - 1), bps))
  }

  private def writeFixed(bw: Bw, block: Array[Int], bps: Int, order: Int): Unit = {
    subframeHeader(bw, 0x08 | order)
    var i = 0
    while (i < order) { bw.bits(block(i).toLong & ((1L << bps) - 1), bps); i += 1 }
    val res = new Array[Int](block.length - order)
    i = order
    while (i < block.length) {
      val p = order match {
        case 1 => block(i - 1).toLong
        case 2 => 2L * block(i - 1) - block(i - 2)
        case _ => throw new IllegalArgumentException("fixture fixed orders: 1, 2")
      }
      res(i - order) = (block(i) - p).toInt
      i += 1
    }
    writeRice(bw, res)
  }

  /** LPC order 2 with integer coefficients [2, -1] and shift 0 — the
    * same predictor as FIXED order 2 expressed through the general LPC
    * path (coefficient read, shift, long accumulation all exercised).
    */
  private def writeLpc(bw: Bw, block: Array[Int], bps: Int): Unit = {
    subframeHeader(bw, 0x20 | (2 - 1))
    bw.bits(block(0).toLong & ((1L << bps) - 1), bps)
    bw.bits(block(1).toLong & ((1L << bps) - 1), bps)
    bw.bits(4 - 1, 4) // precision 4 bits
    bw.bits(0, 5) // shift 0
    bw.bits(2L & 0xf, 4) // coef[0] = 2
    bw.bits((-1L) & 0xf, 4) // coef[1] = -1
    val res = new Array[Int](block.length - 2)
    var i = 2
    while (i < block.length) {
      res(i - 2) = (block(i) - (2L * block(i - 1) - block(i - 2))).toInt
      i += 1
    }
    writeRice(bw, res)
  }

  /** Single-partition Rice (method 0): param fitted to the max zigzag
    * value, escape-raw when it would not fit 14 bits.
    */
  private def writeRice(bw: Bw, res: Array[Int]): Unit = {
    bw.bits(0, 2) // Rice, 4-bit params
    bw.bits(0, 4) // partition order 0
    val us = res.map(v => ((v.toLong << 1) ^ (v.toLong >> 63)))
    val maxU = us.foldLeft(0L)(math.max)
    val need = 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxU, 1L))
    if (need > 20) { // keep unary quotients bounded; fall back to raw
      val raw = need + 1
      require(raw <= 31, s"fixture residual needs $raw raw bits (> 31)")
      bw.bits(15, 4) // escape
      bw.bits(raw, 5)
      res.foreach(v => bw.bits(v.toLong & ((1L << raw) - 1), raw))
    } else {
      val p = math.max(0, math.min(14, need - 2))
      bw.bits(p, 4)
      us.foreach { u =>
        val q = (u >>> p).toInt
        var i = 0
        while (i < q) { bw.bits(0, 1); i += 1 }
        bw.bits(1, 1)
        if (p > 0) bw.bits(u & ((1L << p) - 1), p)
      }
    }
  }
}
