package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic synthetic PCM WAV generator — the AUDIO twin of the
  * JPEG/PNG fixture corpora ([[graft.operators.Multimodal.pixelJpegCorpus]]).
  * Every generated payload is a REAL RIFF/WAVE stream (canonical fmt +
  * data chunk walk, little-endian) decodable by any WAV reader
  * (WavContentSpec differentially decodes them through
  * `javax.sound.sampled.AudioSystem`).
  *
  * Source signal (a pure function of `id`, shared by every variant of
  * the same id): 65 windows × 32 samples of a 16-sample-period square
  * wave, window amplitudes md5-derived on a 512-step lattice in
  * [1024, 26624] with adjacent windows forced distinct — so the
  * envelope comparisons [[WavContentHash]] fingerprints are
  * well-separated (|Δsum| ≥ 32·512 between adjacent windows) and every
  * re-encode twin lands at Hamming EXACTLY 0:
  *
  *  - `base`      — 16-bit mono PCM, 8 kHz.
  *  - `gain`      — every sample arithmetically halved (the volume-
  *                  normalized re-encode). Amplitudes sit on an even
  *                  lattice, so halving is exact and every envelope
  *                  comparison is preserved bit-for-bit.
  *  - `pad`       — 500 zero samples prepended AND appended, plus a
  *                  LIST/INFO metadata chunk before `data` (the remux-
  *                  with-silence case); the decoder's silence trim
  *                  recovers the identical sample run.
  *  - `quant8`    — the same waveform stored as 8-bit unsigned PCM (the
  *                  bit-depth-reduced re-encode). Amplitudes are 512
  *                  multiples, so the 8-bit round trip is exact.
  *  - `stereo`    — the signal duplicated into 2 interleaved channels
  *                  (the mono→stereo remux); the decoder's mixdown
  *                  `(L+R)/2` recovers it exactly.
  *  - `truncated` — `base` with the data chunk torn in half (the torn
  *                  download; must decode to NULL, never throw).
  *  - `garbage`   — not a RIFF stream at all.
  *  - `float32`   — the fmt tag flipped to 3 (IEEE float): a valid-
  *                  looking container [[WavContentHash]] must cleanly
  *                  reject (NULL ⇒ the byte-level [[BlockHash64]] family
  *                  keeps covering it).
  */
case class SyntheticWav(child: Expression, mode: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_synthetic_wav"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if WavFixture.Modes.contains(mode) => TypeCheckSuccess
    case LongType => TypeCheckFailure(
      s"$prettyName: unknown mode '$mode' (expected one of ${WavFixture.Modes.mkString(", ")})")
    case dt => TypeCheckFailure(
      s"$prettyName requires a long id argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavFixture.build(input.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = s"${WavFixture.getClass.getName.stripSuffix("$")}$$.MODULE$$"
      s"${ev.value} = $impl.build($v, \"$mode\");"
    })

  override protected def withNewChildInternal(newChild: Expression): SyntheticWav =
    copy(child = newChild)
}

object WavFixture {

  val Modes: Set[String] =
    Set("base", "gain", "pad", "quant8", "stereo", "truncated", "garbage", "float32")

  /** 65 windows × 32 samples — aligned with [[WavContentHash]]'s 65
    * fingerprint windows so every envelope comparison separates by a
    * full amplitude step.
    */
  final val Windows = 65
  final val WindowSamples = 32
  final val SampleRate = 8000

  /** Window amplitudes for one id: md5-lattice values, adjacent windows
    * forced distinct (so no envelope comparison ever ties).
    */
  private[expressions] def amplitudes(id: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val a = new Array[Int](Windows)
    var w = 0
    while (w < Windows) {
      val h = md.digest(s"$id|aw$w".getBytes("UTF-8"))
      var amp = 1024 + (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % 50) * 512
      if (w > 0 && amp == a(w - 1)) amp += 512
      a(w) = amp
      w += 1
    }
    a
  }

  /** The shared 16-bit sample run (square wave, period 16). */
  private[expressions] def samples(id: Long): Array[Int] = {
    val amps = amplitudes(id)
    val out = new Array[Int](Windows * WindowSamples)
    var i = 0
    while (i < out.length) {
      val amp = amps(i / WindowSamples)
      out(i) = if ((i % 16) < 8) amp else -amp
      i += 1
    }
    out
  }

  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def tag(out: java.io.ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes("US-ASCII"))

  /** A complete RIFF/WAVE stream around the given PCM body. */
  private def wav(fmtTag: Int, channels: Int, bits: Int,
      listChunk: Boolean, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val info = "graft-fixture".getBytes("US-ASCII") // odd length: pad byte
    val listLen = if (listChunk) 8 + 4 + 8 + info.length + (info.length & 1) else 0
    val byteRate = SampleRate * channels * bits / 8
    tag(out, "RIFF"); le32(out, 4 + 24 + listLen + 8 + data.length); tag(out, "WAVE")
    tag(out, "fmt "); le32(out, 16)
    le16(out, fmtTag); le16(out, channels); le32(out, SampleRate)
    le32(out, byteRate); le16(out, channels * bits / 8); le16(out, bits)
    if (listChunk) {
      tag(out, "LIST"); le32(out, 4 + 8 + info.length + (info.length & 1))
      tag(out, "INFO"); tag(out, "INAM"); le32(out, info.length)
      out.write(info); if ((info.length & 1) == 1) out.write(0)
    }
    tag(out, "data"); le32(out, data.length)
    out.write(data)
    out.toByteArray
  }

  private def pcm16(s: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](s.length * 2)
    var i = 0
    while (i < s.length) {
      b(2 * i) = (s(i) & 0xff).toByte
      b(2 * i + 1) = ((s(i) >> 8) & 0xff).toByte
      i += 1
    }
    b
  }

  def build(id: Long, mode: String): Array[Byte] = mode match {
    case "base" => wav(1, 1, 16, listChunk = false, pcm16(samples(id)))
    case "gain" => wav(1, 1, 16, listChunk = false, pcm16(samples(id).map(_ >> 1)))
    case "pad" =>
      val s = samples(id)
      val padded = new Array[Int](500) ++ s ++ new Array[Int](500)
      wav(1, 1, 16, listChunk = true, pcm16(padded))
    case "quant8" =>
      val s = samples(id)
      val b = new Array[Byte](s.length)
      var i = 0
      while (i < s.length) { b(i) = (128 + (s(i) >> 8)).toByte; i += 1 }
      wav(1, 1, 8, listChunk = false, b)
    case "stereo" =>
      val s = samples(id)
      val inter = new Array[Int](s.length * 2)
      var i = 0
      while (i < s.length) { inter(2 * i) = s(i); inter(2 * i + 1) = s(i); i += 1 }
      wav(1, 2, 16, listChunk = false, pcm16(inter))
    case "truncated" =>
      val full = build(id, "base")
      java.util.Arrays.copyOf(full, full.length / 2)
    case "garbage" =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < 16) { out.write(md.digest(s"$id|g$i".getBytes("UTF-8"))); i += 1 }
      out.toByteArray
    case "float32" => wav(3, 1, 16, listChunk = false, pcm16(samples(id)))
    case other => throw new IllegalArgumentException(s"unknown SyntheticWav mode '$other'")
  }
}
