package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic synthetic PDF generator — real classic-xref PDFs
  * (header, catalog → pages → kids object graph, Helvetica font,
  * byte-exact cross-reference table with 20-byte entries, trailer,
  * startxref) whose two pages exercise every text-operator path
  * [[PdfText]] interprets: `Tj`, kerned `TJ` arrays, `'`, `Td` line
  * breaks, the full literal-string escape set, and hex strings. Page
  * text is md5-derived from `id`, so the extraction oracle re-derives
  * it in SQL.
  *
  * Variants (`mode`):
  *  - `flate`      — both content streams FlateDecode-compressed (the
  *                   real-world default; exercises the inflate path).
  *  - `raw`        — the same streams uncompressed (no /Filter).
  *  - `truncated`  — `flate` torn mid-stream (must extract NULL).
  *  - `garbage`    — not a PDF at all.
  *  - `xrefstream` — startxref points at an OBJECT, the PDF-1.5
  *                   compressed-xref shape: documented-unsupported,
  *                   extracts NULL (the byte family keeps the row).
  */
case class SyntheticPdf(child: Expression, mode: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_synthetic_pdf"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if PdfFixture.Modes.contains(mode) => TypeCheckSuccess
    case LongType => TypeCheckFailure(
      s"$prettyName: unknown mode '$mode' (expected one of ${PdfFixture.Modes.mkString(", ")})")
    case dt => TypeCheckFailure(
      s"$prettyName requires a long id argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PdfFixture.build(input.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = s"${PdfFixture.getClass.getName.stripSuffix("$")}$$.MODULE$$"
      s"${ev.value} = $impl.build($v, \"$mode\");"
    })

  override protected def withNewChildInternal(newChild: Expression): SyntheticPdf =
    copy(child = newChild)
}

object PdfFixture {

  val Modes: Set[String] = Set("flate", "raw", "truncated", "garbage", "xrefstream")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** The text [[PdfText]] extracts from a clean fixture of `id` — the
    * contract PdfSpec and the SQL oracle both re-derive.
    */
  def expectedText(id: Long): String = {
    def h(k: Int) = md5hex(s"$id|pdf$k")
    s"pdf ${h(0)}\nkern ${h(1)}\nesc ( ) \\ end\nhex ${h(2)}\npage2 ${h(3)}\nmore ${h(4)}"
  }

  def build(id: Long, mode: String): Array[Byte] = mode match {
    case "flate" => assemble(id, compress = true, xrefStream = false)
    case "raw" => assemble(id, compress = false, xrefStream = false)
    case "truncated" =>
      val full = assemble(id, compress = true, xrefStream = false)
      java.util.Arrays.copyOfRange(full, 0, full.length / 2)
    case "garbage" =>
      java.security.MessageDigest.getInstance("MD5").digest(s"$id|pdfjunk".getBytes("UTF-8"))
    case "xrefstream" => assemble(id, compress = true, xrefStream = true)
    case other => throw new IllegalArgumentException(s"synthetic_pdf: unknown mode '$other'")
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def assemble(id: Long, compress: Boolean, xrefStream: Boolean): Array[Byte] = {
    def h(k: Int) = md5hex(s"$id|pdf$k")
    // content streams: every operator class the interpreter handles
    val hexShow = s"hex ${h(2)}".getBytes("ISO-8859-1").map(b => f"$b%02X").mkString
    val content1 =
      s"""BT
         |/F1 12 Tf
         |72 720 Td
         |(pdf ${h(0)}) Tj
         |0 -14 Td
         |[(kern ) -120 (${h(1)})] TJ
         |0 -14 Td
         |(esc \\( \\) \\\\ end) Tj
         |0 -14 Td
         |<$hexShow> Tj
         |ET""".stripMargin.getBytes("ISO-8859-1")
    val content2 =
      s"""BT
         |/F1 12 Tf
         |72 720 Td
         |(page2 ${h(3)}) Tj
         |(more ${h(4)}) '
         |ET""".stripMargin.getBytes("ISO-8859-1")

    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = new Array[Int](8)
    w("%PDF-1.4\n%âãÏÓ\n")
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2)(w("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"))
    obj(3)(w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>"))
    obj(4)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    obj(5)(w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents [7 0 R] >>"))
    def streamObj(num: Int, raw: Array[Byte]): Unit = obj(num) {
      val data = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream")
    }
    streamObj(6, content1)
    streamObj(7, content2)
    val xrefOff = out.size()
    if (xrefStream) {
      // PDF-1.5 shape: startxref points at an OBJECT, not a table —
      // the walk must cleanly decline (documented-unsupported)
      w("8 0 obj\n<< /Type /XRef /Size 9 >>\nstream\nxx\nendstream\nendobj\n")
      w(s"startxref\n$xrefOff\n%%EOF\n")
    } else {
      w("xref\n0 8\n")
      w("0000000000 65535 f \n")
      (1 to 7).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
      w("trailer\n<< /Size 8 /Root 1 0 R >>\n")
      w(s"startxref\n$xrefOff\n%%EOF\n")
    }
    out.toByteArray
  }
}
