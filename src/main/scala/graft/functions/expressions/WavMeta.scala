package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Audio-header sniffing over an opaque `binary` payload column — the
  * audio sibling of [[ImageDims]]: returns
  * `struct<sample_rate: int, channels: int, bits: int, duration_ms: long>`
  * for RIFF/WAVE payloads, NULL otherwise. A corpus pipeline filters and
  * buckets audio by rate/channels/duration from the first bytes alone —
  * the payload is never decoded, expanded, or shuffled.
  *
  * A real chunk walk, not fixed offsets: RIFF container signature, then
  * little-endian sized chunks (even-padded per the spec) until both the
  * `fmt ` chunk (rate/channels/bits at their spec offsets) and the `data`
  * chunk (byte length) are seen — LIST/INFO/fact chunks of any size may
  * precede either. `duration_ms = data_len * 1000 / byte_rate`, integer
  * division (both engines truncate non-negative division identically).
  *
  * Truncated/garbage payloads return NULL rather than throwing.
  */
case class WavMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_meta"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val parser = ctx.addReferenceObj("wavMetaParser", WavMeta, WavMeta.getClass.getName)
      s"""
        |${ev.value} = (InternalRow) $parser.parse($v);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavMeta =
    copy(child = newChild)
}

object WavMeta {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Returns (sample_rate, channels, bits, duration_ms), or null if `b` is
    * not a parseable RIFF/WAVE header. O(#chunks) over the first bytes.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    // pos is Long: a declared chunk size near Int.MaxValue must advance the
    // cursor past the buffer (terminating the walk), not wrap negative and
    // index out of bounds — corrupt payloads return NULL, never throw
    var pos = 12L
    var rate = -1L
    var channels = -1
    var bits = -1
    var byteRate = -1L
    var dataLen = -1L
    while (pos + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val p = pos.toInt
      val size = le32(b, p + 4)
      if (tag(b, p, "fmt ")) {
        if (pos + 8 + 16 > b.length) return null
        channels = le16(b, p + 10)
        rate = le32(b, p + 12)
        byteRate = le32(b, p + 16)
        bits = le16(b, p + 22)
      } else if (tag(b, p, "data")) {
        dataLen = size
      }
      // chunks are even-padded per the RIFF spec; the data chunk's payload
      // need not be present (header-only corpus rows) — stepping past the
      // end just terminates the walk
      pos += 8L + size + (size & 1L)
    }
    // a garbage fmt chunk can declare rate/byteRate up to 2^32-1; reject
    // anything that will not fit the int result instead of emitting negatives
    if (rate <= 0 || rate > Int.MaxValue || channels <= 0 || bits <= 0 ||
        byteRate <= 0 || dataLen < 0) return null
    val durationMs = dataLen * 1000L / byteRate
    new GenericInternalRow(Array[Any](rate.toInt, channels, bits, durationMs))
  }
}
