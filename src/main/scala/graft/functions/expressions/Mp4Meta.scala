package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Video-container sniffing over an opaque `binary` payload column — the
  * ISO-BMFF (MP4/MOV, ISO 14496-12) sibling of [[ImageDims]]/[[WavMeta]]:
  * returns `struct<brand: string, timescale: long, duration: long,
  * duration_ms: long>` from the container boxes alone, NULL otherwise. A
  * corpus pipeline filters/buckets video by brand and duration without
  * decoding a single frame — the payload is never expanded or shuffled.
  *
  * A real box walk, not fixed offsets: big-endian `(size, fourcc)` boxes
  * at the top level (`size == 1` reads the 64-bit largesize that real
  * >4 GiB files use; `size == 0` means to-end-of-payload), `ftyp`
  * contributes the major brand, and `moov`'s children are walked to
  * `mvhd`, honoring BOTH versions: v0 (32-bit times, timescale at payload
  * offset +12) and v1 (64-bit times, timescale at +20) — a parser that
  * assumes v0 offsets reads garbage timescales on v1 files, which the
  * fixture's v1 rows (durations above 2^32) would expose.
  * `duration_ms = duration * 1000 / timescale`, integer division.
  *
  * Truncated/garbage payloads return NULL rather than throwing (sizes
  * walked as longs — a corrupt 32-bit size cannot wrap the cursor).
  */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_meta"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Mp4Meta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val parser = ctx.addReferenceObj("mp4MetaParser", Mp4Meta, Mp4Meta.getClass.getName)
      s"""
        |${ev.value} = (InternalRow) $parser.parse($v);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
    copy(child = newChild)
}

object Mp4Meta {

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** mvhd payload (after the RESOLVED box header — 8 plain or 16
    * largesize; a fixed-8 assumption would read the first largesize byte
    * as the version and emit size bytes as timescale/duration) →
    * (timescale, duration), honoring version; null on truncation/bad
    * version.
    */
  private def mvhd(b: Array[Byte], p: Long, hdr: Long, end: Long): Array[Long] = {
    if (p + hdr + 4 > end || p + hdr + 4 > b.length) return null
    val q = (p + hdr).toInt
    b(q) match {
      case 0 => // ver(1) flags(3) ctime(4) mtime(4) ts(4) dur(4)
        if (p + hdr + 20 > end || p + hdr + 20 > b.length) null
        else Array(be32(b, q + 12), be32(b, q + 16))
      case 1 => // ver(1) flags(3) ctime(8) mtime(8) ts(4) dur(8)
        if (p + hdr + 32 > end || p + hdr + 32 > b.length) null
        else Array(be32(b, q + 20), be64(b, q + 24))
      case _ => null
    }
  }

  /** Returns (brand, timescale, duration, duration_ms) or null. O(#boxes)
    * over the container structure; media payload bytes are never touched.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    var brand: String = null
    var ts = -1L
    var dur = -1L
    var pos = 0L
    while (pos + 8 <= b.length && (brand == null || ts < 0)) {
      val p = pos.toInt
      val size32 = be32(b, p)
      // resolve the real box extent: largesize, to-end, or plain
      var hdr = 8L
      val size: Long =
        if (size32 == 1L) {
          if (pos + 16 > b.length) return null
          hdr = 16L
          be64(b, p + 8)
        } else if (size32 == 0L) b.length - pos
        else size32
      if (size < hdr) return null // malformed: box smaller than its header
      val end = pos + size
      if (tag(b, p + 4, "ftyp")) {
        if (pos + hdr + 4 > b.length) return null
        val q = (pos + hdr).toInt
        brand = new String(b, q, 4, java.nio.charset.StandardCharsets.US_ASCII)
      } else if (tag(b, p + 4, "moov")) {
        val cend = math.min(end, b.length.toLong)
        var cpos = pos + hdr
        while (cpos + 8 <= cend && ts < 0) {
          val cp = cpos.toInt
          val cs32 = be32(b, cp)
          var chdr = 8L
          val cs: Long =
            if (cs32 == 1L) {
              if (cpos + 16 > cend) return null
              chdr = 16L
              be64(b, cp + 8)
            } else if (cs32 == 0L) cend - cpos
            else cs32
          if (cs < chdr) return null
          if (tag(b, cp + 4, "mvhd")) {
            val td = mvhd(b, cpos, chdr, math.min(cpos + cs, cend))
            if (td == null) return null
            ts = td(0); dur = td(1)
          }
          cpos += cs
        }
      }
      pos += size
    }
    // reject durations whose ms conversion would wrap a long (a corrupt
    // 64-bit duration near 2^63, not any real file — 2^63/1000 ticks is
    // ~292 My even at timescale 1) instead of emitting garbage
    if (brand == null || ts <= 0 || dur < 0 || dur > Long.MaxValue / 1000L) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(brand), ts, dur, dur * 1000L / ts))
  }
}
