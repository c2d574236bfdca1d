package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Image-header sniffing over an opaque `binary` payload column: returns
  * `struct<format: string, width: int, height: int>` for PNG and JPEG
  * payloads, NULL for anything else — the metadata-extraction step a
  * training-data pipeline runs to filter/bucket a multimodal corpus
  * without ever decoding pixels (the 100 TB shape: dims come from the
  * first bytes, the payload itself is never expanded or shuffled).
  *
  * Real parsers, not fixed offsets:
  *  - PNG: 8-byte signature, then the IHDR chunk's big-endian width/height
  *    (PNG spec: IHDR is always the first chunk, at offset 16/20).
  *  - JPEG: SOI marker, then a real SEGMENT WALK — skip APPn/COM/DQT/...
  *    segments by their big-endian lengths until a frame header (SOF0-3,
  *    5-7, 9-11, 13-15: baseline/progressive/lossless, all share the
  *    height-then-width layout), honoring zero-length markers (RST, TEM).
  *    A fixed-offset cheat fails on any payload with variable-length
  *    leading segments.
  *
  * Truncated/garbage payloads return NULL rather than throwing — corrupt
  * rows are data, not errors, in a corpus-scale ingest.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_dims"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageDims.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // the parser is a plain static-shaped method on the companion —
      // generated code calls it directly and stays inside the codegen stage
      val parser = ctx.addReferenceObj("imageDimsParser", ImageDims,
        ImageDims.getClass.getName)
      s"""
        |${ev.value} = (InternalRow) $parser.parse($v);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object ImageDims {

  private val PngFormat = UTF8String.fromString("png")
  private val JpegFormat = UTF8String.fromString("jpeg")

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Returns a (format, width, height) row, or null if `b` is not a
    * parseable PNG/JPEG header. Total work is O(#leading segments) on the
    * first bytes only.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    // PNG: \x89 P N G \r \n \x1a \n, IHDR chunk first (spec-mandated)
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) {
      if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16)
        val h = be32(b, 20)
        if (w > 0 && h > 0)
          return new GenericInternalRow(Array[Any](PngFormat, w, h))
      }
      return null
    }
    // JPEG: FF D8 (SOI), then marker segments until a start-of-frame
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var pos = 2
      while (pos + 3 < b.length) {
        if ((b(pos) & 0xff) != 0xff) return null
        // the spec permits runs of 0xFF fill bytes between segments; the
        // marker code is the first non-FF byte after the run
        while (pos + 2 < b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
        if (pos + 3 >= b.length || (b(pos + 1) & 0xff) == 0xff) return null
        val marker = b(pos + 1) & 0xff
        marker match {
          // SOF0-3/5-7/9-11/13-15: [len][precision][height:2][width:2]...
          case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
            if (pos + 8 >= b.length) return null
            val h = be16(b, pos + 5)
            val w = be16(b, pos + 7)
            if (w > 0 && h > 0)
              return new GenericInternalRow(Array[Any](JpegFormat, w, h))
            return null
          // zero-payload markers: another SOI, TEM, RST0-7 — just step over
          case m if m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
            pos += 2
          // EOI / start-of-scan before any SOF: no dimensions to find
          case m if m == 0xd9 || m == 0xda =>
            return null
          // every other segment carries a big-endian length (incl. itself)
          case _ =>
            val segLen = be16(b, pos + 2)
            if (segLen < 2) return null
            pos += 2 + segLen
        }
      }
      return null
    }
    null
  }
}
