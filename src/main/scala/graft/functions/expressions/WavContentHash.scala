package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** CONTENT-LEVEL fingerprint for PCM WAV payloads — the audio sibling of
  * [[PngPixelHash]]/[[JpegPixelHash]]: decode the sample stream (real
  * RIFF chunk walk; 8-bit unsigned / 16-bit signed PCM, mono or stereo
  * mixed down `(L+R)/2`), TRIM leading/trailing near-silence
  * (|s| ≤ [[WavContentHash.SilenceFloor]]), split the run into 65
  * equal-size windows (tail remainder dropped — equal windows make the
  * comparisons exact-integer with no cross-multiplication), sum |sample|
  * per window, and emit 64 envelope-gradient bits — bit `i` set iff
  * `sum[i+1] > sum[i]`. The envelope SHAPE survives every common audio
  * re-encode the byte-level [[BlockHash64]] provably misses:
  *
  *  - volume normalization — a positive gain preserves the ordering of
  *    window energies (halving on an even lattice is exact: Hamming 0
  *    on the fixtures);
  *  - silence padding / trimming at the edges — removed by the trim;
  *  - bit-depth reduction (16→8) — quantization moves each |sample| by
  *    < 256, far under any real envelope step;
  *  - mono↔stereo remux — the mixdown recovers the signal.
  *
  * Returns NULL for anything not cleanly-decodable integer PCM:
  * non-RIFF bytes, float/compressed format tags, 24/32-bit depth, >2
  * channels, a data chunk longer than the payload (torn download), or
  * fewer than 65 post-trim samples — never throws (fuzzed in
  * WavContentSpec). Those rows keep the byte-level family.
  *
  * Scale: one codegen'd projection; the payload never shuffles — only
  * the 8-byte hash flows into the banded pair machinery
  * ([[graft.operators.Dedup.hammingPairs64]]).
  */
case class WavContentHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_content_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavContentHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("wavContentHashImpl", WavContentHash,
        WavContentHash.getClass.getName)
      val tmp = ctx.freshName("wch")
      s"""
        |java.lang.Long $tmp = $impl.hash($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp.longValue(); }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavContentHash =
    copy(child = newChild)
}

object WavContentHash {

  /** Fingerprint windows: 65 windows → 64 envelope-gradient bits. */
  final val Windows = 65

  /** Edge samples at or below this 16-bit magnitude are trimmed —
    * scale-robust for any gain ≥ 1/4 over a real signal floor (the
    * fixtures' lowest amplitude is 1024; 1024 >> 2 = 256 still clears).
    */
  final val SilenceFloor = 256

  private def le16u(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** 64-bit envelope fingerprint, or null if `b` is not cleanly-decodable
    * integer PCM. O(bytes), never throws.
    */
  def hash(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    // chunk walk (Long cursor: a near-2^31 declared size must terminate
    // the walk, not wrap negative — corrupt payloads return NULL)
    var pos = 12L
    var fmtTag = -1; var channels = -1; var bits = -1
    var dataOff = -1L; var dataLen = -1L
    while (pos + 8 <= b.length && (fmtTag < 0 || dataOff < 0)) {
      val ckLen = le32(b, (pos + 4).toInt)
      val body = pos + 8
      if (body + ckLen > b.length) {
        // torn chunk: a declared body running past the payload
        if (tag(b, pos.toInt, "data")) return null // torn download
        return null
      }
      if (tag(b, pos.toInt, "fmt ")) {
        if (ckLen < 16) return null
        fmtTag = le16u(b, body.toInt)
        channels = le16u(b, (body + 2).toInt)
        bits = le16u(b, (body + 14).toInt)
      } else if (tag(b, pos.toInt, "data")) {
        dataOff = body; dataLen = ckLen
      }
      pos = body + ckLen + (ckLen & 1L) // chunks are even-padded
    }
    if (fmtTag != 1) return null // integer PCM only (float/ADPCM keep BlockHash64)
    if (channels != 1 && channels != 2) return null
    if (bits != 8 && bits != 16) return null
    if (dataOff < 0 || dataLen <= 0) return null
    val blockAlign = channels * bits / 8
    val frames = (dataLen / blockAlign).toInt
    if (frames <= 0) return null
    // decode + mixdown to a mono int stream
    val s = new Array[Int](frames)
    val off = dataOff.toInt
    var i = 0
    if (bits == 16 && channels == 1) {
      while (i < frames) { s(i) = le16u(b, off + 2 * i).toShort.toInt; i += 1 }
    } else if (bits == 16 && channels == 2) {
      while (i < frames) {
        val l = le16u(b, off + 4 * i).toShort.toInt
        val r = le16u(b, off + 4 * i + 2).toShort.toInt
        s(i) = (l + r) >> 1
        i += 1
      }
    } else if (bits == 8 && channels == 1) {
      while (i < frames) { s(i) = ((b(off + i) & 0xff) - 128) << 8; i += 1 }
    } else { // 8-bit stereo
      while (i < frames) {
        val l = ((b(off + 2 * i) & 0xff) - 128) << 8
        val r = ((b(off + 2 * i + 1) & 0xff) - 128) << 8
        s(i) = (l + r) >> 1
        i += 1
      }
    }
    envelope(s)
  }

  /** The shared envelope contract — trim near-silence, 65 equal windows,
    * 64 gradient bits — over a mono 16-bit-domain sample run. Shared
    * with [[FlacContentHash]] so a FLAC encode of a WAV (the
    * cross-container duplicate class) hashes IDENTICALLY.
    */
  private[expressions] def envelope(s: Array[Int]): java.lang.Long = {
    val frames = s.length
    // trim near-silence at both ends
    var lo = 0
    while (lo < frames && math.abs(s(lo)) <= SilenceFloor) lo += 1
    var hi = frames - 1
    while (hi >= lo && math.abs(s(hi)) <= SilenceFloor) hi -= 1
    val n0 = hi - lo + 1
    val n = n0 - (n0 % Windows) // equal windows: exact integer compares
    if (n < Windows) return null
    val ws = n / Windows
    val sums = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      var acc = 0L
      var j = lo + w * ws
      val end = j + ws
      while (j < end) { acc += math.abs(s(j).toLong); j += 1 }
      sums(w) = acc
      w += 1
    }
    var bitsOut = 0L
    var k = 0
    while (k < 64) {
      if (sums(k + 1) > sums(k)) bitsOut |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(bitsOut)
  }
}
