package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500 Web ARChive — the Common Crawl container) record
  * parser over a binary payload column: split a concatenation of
  * `WARC/1.x` records — PLAIN or GZIPPED (`.warc.gz`, per-record gzip
  * members or one whole-shard member; multi-member inflate is
  * transparent) — into
  * `array<struct<warc_type, target_uri, content_type, content_length, body>>`.
  *
  * CONTENT-LENGTH-DRIVEN, not delimiter-driven: a record's body length
  * comes from its `Content-Length` header and the body bytes are sliced
  * verbatim — a body CONTAINING the `\r\n\r\n` separator (binary
  * payloads, nested HTTP messages) parses correctly where any
  * regex/split approach is simply wrong. This is why the parser is a
  * native expression instead of Column string algebra.
  *
  * Strict totality: the WHOLE payload returns NULL on any malformation —
  * a bad magic, a header block without CRLFCRLF, a missing or
  * non-numeric `Content-Length`, a body running past the payload, or a
  * missing record terminator — never throws, never returns a partial
  * parse (a torn tail would otherwise silently drop records; NULL keeps
  * the row visible to DQ checks). Header names match case-insensitively
  * per the spec; values are trimmed; headers are ISO-8859-1 like HTTP.
  *
  * Scale: one codegen'd projection, O(bytes); a WARC-shard ingest is
  * `explode(warc_records(payload))` — the payload never shuffles, the
  * exploded records carry only the projected columns.
  */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(WarcRecords.RecordType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_records"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WarcRecords.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("warcRecordsImpl", WarcRecords,
        WarcRecords.getClass.getName)
      val tmp = ctx.freshName("warc")
      s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        |  (org.apache.spark.sql.catalyst.util.ArrayData) $impl.parse($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp; }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {

  val RecordType: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("body", BinaryType, nullable = false)))

  /** Sanity ceiling: one payload holds at most this many records. */
  val MaxRecords = 65536

  /** Decompressed-payload ceiling for gzipped shards. */
  val MaxInflatedBytes: Int = 1 << 28 // 256 MB per shard payload

  /** All records, or null on ANY malformation. Never throws — the
    * belt-and-braces NonFatal catch backs the totality contract even if a
    * bound check is ever wrong for some adversarial input shape (this
    * parser's input is untrusted crawl data).
    */
  def parse(b: Array[Byte]): ArrayData =
    try parseImpl(gunzipIfNeeded(b)) catch { case scala.util.control.NonFatal(_) => null }

  /** Real WARC shards ship PER-RECORD-GZIPPED (`.warc.gz` — each record
    * its own gzip member, the Common Crawl layout); `GZIPInputStream`
    * reads concatenated members natively, so the whole shard inflates to
    * the plain record concatenation [[parseImpl]] already handles.
    * Non-gzip payloads pass through untouched; a torn or oversized
    * stream throws into [[parse]]'s NonFatal catch (NULL).
    */
  private def gunzipIfNeeded(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return b
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 16))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) out.write(buf, 0, n)
      if (out.size > MaxInflatedBytes)
        throw new java.io.IOException("gzipped WARC shard exceeds the inflate ceiling")
      n = in.read(buf)
    }
    out.toByteArray
  }

  private def parseImpl(b: Array[Byte]): ArrayData = {
    if (b == null || b.length == 0) return null
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var pos = 0
    while (pos < b.length) {
      if (out.size >= MaxRecords) return null
      // magic: WARC/1.<digit>
      if (pos + 9 > b.length) return null
      val magic = new String(b, pos, 7, "ISO-8859-1")
      if (magic != "WARC/1." || b(pos + 7) < '0' || b(pos + 7) > '9') return null
      // header block ends at the first CRLFCRLF
      var hEnd = pos
      var found = false
      while (!found && hEnd + 4 <= b.length) {
        if (b(hEnd) == '\r' && b(hEnd + 1) == '\n' &&
          b(hEnd + 2) == '\r' && b(hEnd + 3) == '\n') found = true
        else hEnd += 1
      }
      if (!found) return null
      val headers = new String(b, pos, hEnd - pos, "ISO-8859-1")
      var warcType: UTF8String = null
      var targetUri: UTF8String = null
      var contentType: UTF8String = null
      var contentLength = -1L
      val lines = headers.split("\r\n")
      var li = 1
      while (li < lines.length) {
        val line = lines(li)
        val i = line.indexOf(':')
        if (i > 0) {
          val name = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(i + 1).trim
          name match {
            case "warc-type" => warcType = UTF8String.fromString(value)
            case "warc-target-uri" => targetUri = UTF8String.fromString(value)
            case "content-type" => contentType = UTF8String.fromString(value)
            case "content-length" =>
              contentLength = try java.lang.Long.parseLong(value) catch {
                case _: NumberFormatException => -2L // flagged malformed below
              }
            case _ => ()
          }
        }
        li += 1
      }
      if (contentLength == -2L) return null // non-numeric Content-Length
      if (contentLength < 0L || contentLength > Int.MaxValue.toLong) return null
      val bodyStart = hEnd + 4
      // bounds math in Long: a Content-Length near Int.MaxValue must not
      // wrap negative and dodge the torn-body check below
      val bodyEndL = bodyStart.toLong + contentLength
      if (bodyEndL + 4L > b.length.toLong) return null // torn body or missing terminator
      val bodyEnd = bodyEndL.toInt
      if (!(b(bodyEnd) == '\r' && b(bodyEnd + 1) == '\n' &&
        b(bodyEnd + 2) == '\r' && b(bodyEnd + 3) == '\n')) return null
      val body = java.util.Arrays.copyOfRange(b, bodyStart, bodyEnd)
      out += new GenericInternalRow(
        Array[Any](warcType, targetUri, contentType, contentLength, body))
      pos = bodyEnd + 4
    }
    if (out.isEmpty) null else new GenericArrayData(out.toArray[Any])
  }
}
