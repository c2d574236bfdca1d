package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** HTTP/1.1 `Transfer-Encoding: chunked` body reassembly (RFC 9112 §7.1)
  * as a codegen'd native expression — the crawl-extraction leg for WARC
  * response records whose captured payload kept the transfer coding
  * (warcio and Common-Crawl-era captures store the raw response bytes;
  * only payload-digest-normalized archives de-chunk). Input: the body
  * bytes AFTER the header/body split; output: the reassembled entity
  * bytes, with chunk-size lines (hex size + optional `;ext`), the
  * terminating `0` chunk, and any trailer section removed.
  *
  * NEVER THROWS: a malformed chunk framing (non-hex size, size running
  * past the buffer, missing CRLF, truncated chunk) decodes to NULL — the
  * conservative drop-the-record rule every decoder in this family
  * follows (fuzzed in ParserFuzzSpec). NULL in -> NULL out.
  *
  * reference: the reference ingests pre-extracted text and never parses
  * HTTP framing; this closes the raw-crawl gap the r15 verdict flagged
  * (`pipeline_crawl_extract`'s Content-Length-only slicing).
  */
case class HttpChunkedDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_http_unchunk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HttpChunkedDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("httpUnchunkImpl", HttpChunkedDecode,
        HttpChunkedDecode.getClass.getName)
      val tmp = ctx.freshName("unchunked")
      s"""
        |byte[] $tmp = $impl.decode($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp; }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HttpChunkedDecode =
    copy(child = newChild)
}

object HttpChunkedDecode {

  /** Reassembled entity bytes, or null on ANY framing violation. */
  def decode(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var p = 0
    while (true) {
      // chunk-size line: 1*HEXDIG [ ";" ext ] CRLF
      var size = 0L
      var digits = 0
      while (p < body.length && isHex(body(p)) && digits <= 8) {
        size = (size << 4) | hexVal(body(p))
        p += 1; digits += 1
      }
      if (digits == 0 || digits > 8) return null // no size / absurd size
      // optional chunk extension: skip to CRLF (no bare CR/LF inside)
      while (p < body.length && body(p) != '\r' && body(p) != '\n') p += 1
      if (p + 1 >= body.length || body(p) != '\r' || body(p + 1) != '\n') return null
      p += 2
      if (size == 0L) {
        // trailer section: zero or more header lines, then the final CRLF
        while (true) {
          if (p + 1 < body.length && body(p) == '\r' && body(p + 1) == '\n')
            return out.toByteArray // done; bytes past the terminator ignored
          // a trailer line: skip through its CRLF
          val lineStart = p
          while (p < body.length && body(p) != '\n') p += 1
          if (p >= body.length || p == lineStart) return null
          p += 1
        }
      }
      if (size > Int.MaxValue || p + size > body.length) return null
      out.write(body, p, size.toInt)
      p += size.toInt
      // each chunk's data is followed by CRLF
      if (p + 1 >= body.length || body(p) != '\r' || body(p + 1) != '\n') return null
      p += 2
    }
    null // unreachable
  }

  private def isHex(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F')

  private def hexVal(b: Byte): Int =
    if (b <= '9') b - '0'
    else if (b >= 'a') b - 'a' + 10
    else b - 'A' + 10
}
