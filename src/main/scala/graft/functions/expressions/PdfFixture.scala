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

  val Modes: Set[String] =
    Set("flate", "raw", "modern", "modernpred", "truncated", "garbage", "xrefstream",
      "cid", "cidtrunc")

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
    case "modern" => assembleModern(id, predictor = false)
    case "modernpred" => assembleModern(id, predictor = true)
    case "truncated" =>
      val full = assemble(id, compress = true, xrefStream = false)
      java.util.Arrays.copyOfRange(full, 0, full.length / 2)
    case "garbage" =>
      java.security.MessageDigest.getInstance("MD5").digest(s"$id|pdfjunk".getBytes("UTF-8"))
    case "xrefstream" => assemble(id, compress = true, xrefStream = true)
    case "cid" => assembleCid(id)
    case "cidtrunc" =>
      val full = assembleCid(id)
      java.util.Arrays.copyOfRange(full, 0, (full.length * 3) / 5)
    case other => throw new IllegalArgumentException(s"synthetic_pdf: unknown mode '$other'")
  }

  /** The SAME text delivered through a Type0/Identity-H CID font (the
    * embedded-subset shape every modern PDF producer emits): page 1's
    * show strings are 2-byte CID codes — 'p'/'d'/'f' through private-use
    * codes the ToUnicode CMap maps via `bfchar`, everything else through
    * an ASCII-identity `bfrange` — with a mid-page `Tf` switch back to
    * the simple font for one line; page 2 stays simple-font. Extracted
    * text must equal [[expectedText]] exactly.
    */
  private def assembleCid(id: Long): Array[Byte] = {
    def h(k: Int) = md5hex(s"$id|pdf$k")
    // 'p'->E000 'd'->E001 'f'->E002 (bfchar); others = ASCII code (bfrange)
    def codes(s: String): String = s.map {
      case 'p' => "E000"
      case 'd' => "E001"
      case 'f' => "E002"
      case c => f"${c.toInt}%04X"
    }.mkString
    val content1 =
      s"""BT
         |/F0 12 Tf
         |72 720 Td
         |<${codes(s"pdf ${h(0)}")}> Tj
         |0 -14 Td
         |[<${codes("kern ")}> -120 <${codes(h(1))}>] TJ
         |0 -14 Td
         |/F1 12 Tf
         |(esc \\( \\) \\\\ end) Tj
         |0 -14 Td
         |/F0 12 Tf
         |<${codes(s"hex ${h(2)}")}> Tj
         |ET""".stripMargin.getBytes("ISO-8859-1")
    val content2 =
      s"""BT
         |/F1 12 Tf
         |72 720 Td
         |(page2 ${h(3)}) Tj
         |(more ${h(4)}) '
         |ET""".stripMargin.getBytes("ISO-8859-1")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |12 dict begin
         |begincmap
         |/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def
         |/CMapName /Synth-UCS def
         |/CMapType 2 def
         |1 begincodespacerange
         |<0000> <FFFF>
         |endcodespacerange
         |3 beginbfchar
         |<E000> <0070>
         |<E001> <0064>
         |<E002> <0066>
         |endbfchar
         |1 beginbfrange
         |<0020> <007E> <0020>
         |endbfrange
         |endcmap
         |CMap defined
         |end end""".stripMargin.getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = new Array[Int](11)
    w("%PDF-1.4\n%âãÏÓ\n")
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    def streamObj(num: Int, raw: Array[Byte]): Unit = obj(num) {
      val data = deflate(raw)
      w(s"<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream")
    }
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2)(w("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"))
    obj(3)(w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F0 8 0 R /F1 4 0 R >> >> /Contents 6 0 R >>"))
    obj(4)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    obj(5)(w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents [7 0 R] >>"))
    streamObj(6, content1)
    streamObj(7, content2)
    obj(8)(w("<< /Type /Font /Subtype /Type0 /BaseFont /Synth-Identity-H " +
      "/Encoding /Identity-H /DescendantFonts [9 0 R] /ToUnicode 10 0 R >>"))
    obj(9)(w("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
      "/DW 1000 >>"))
    streamObj(10, cmap)
    val xrefOff = out.size()
    w("xref\n0 11\n")
    w("0000000000 65535 f \n")
    (1 to 10).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
    w("trailer\n<< /Size 11 /Root 1 0 R >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
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

  /** The two pages' content-stream bytes — every operator class the
    * interpreter handles.
    */
  private def contents(id: Long): (Array[Byte], Array[Byte]) = {
    def h(k: Int) = md5hex(s"$id|pdf$k")
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
    (content1, content2)
  }

  private def assemble(id: Long, compress: Boolean, xrefStream: Boolean): Array[Byte] = {
    val (content1, content2) = contents(id)
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
      // a MALFORMED 1.5 shape: an XRef object with no /W and a garbage
      // stream — the walk must cleanly decline (the well-formed modern
      // shape is `modern`/`modernpred`)
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

  /** The PDF-1.5 shape real producers emit: the catalog/pages/font
    * dicts packed into a Flate OBJECT STREAM, content streams direct,
    * and a CROSS-REFERENCE STREAM (`/W [1 2 1]`, type-1 and type-2
    * entries) as the trailer — optionally pre-filtered with the PNG Up
    * predictor (`/DecodeParms << /Predictor 12 /Columns 4 >>`, the
    * common xref-stream encoding).
    */
  private def assembleModern(id: Long, predictor: Boolean): Array[Byte] = {
    val (content1, content2) = contents(id)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = new Array[Int](10)
    w("%PDF-1.5\n%âãÏÓ\n")
    def streamObj(num: Int, raw: Array[Byte]): Unit = {
      offsets(num) = out.size()
      val data = deflate(raw)
      w(s"$num 0 obj\n<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    streamObj(6, content1)
    streamObj(7, content2)
    // object stream (8): objects 1..5 packed behind the pair header
    val bodies = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>"),
      4 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      5 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents [7 0 R] >>"))
    val payload = new StringBuilder
    val pairs = new StringBuilder
    bodies.foreach { case (n, s) =>
      pairs.append(s"$n ${payload.length} ")
      payload.append(s).append(' ')
    }
    val first = pairs.length
    val stmData = (pairs.toString + payload.toString).getBytes("ISO-8859-1")
    val z = deflate(stmData)
    offsets(8) = out.size()
    w(s"8 0 obj\n<< /Type /ObjStm /N ${bodies.length} /First $first " +
      s"/Length ${z.length} /Filter /FlateDecode >>\nstream\n")
    out.write(z, 0, z.length)
    w("\nendstream\nendobj\n")
    // cross-reference stream (9): W=[1,2,1] rows for objects 0..9
    val xrefOff = out.size()
    offsets(9) = xrefOff
    val rowW = 4
    val table = new Array[Byte](10 * rowW)
    def put(i: Int, t: Int, f2: Int, f3: Int): Unit = {
      table(i * rowW) = t.toByte
      table(i * rowW + 1) = ((f2 >> 8) & 0xff).toByte
      table(i * rowW + 2) = (f2 & 0xff).toByte
      table(i * rowW + 3) = (f3 & 0xff).toByte
    }
    put(0, 0, 0, 0xff) // free head
    (1 to 5).foreach(n => put(n, 2, 8, n - 1)) // packed in objstm 8
    Seq(6, 7, 8, 9).foreach(n => put(n, 1, offsets(n), 0))
    val enc =
      if (!predictor) table
      else { // PNG Up pre-filter: rows of 4 columns, filter byte 2
        val e = new Array[Byte](10 * (rowW + 1))
        var r = 0
        while (r < 10) {
          e(r * (rowW + 1)) = 2
          var i = 0
          while (i < rowW) {
            val up = if (r > 0) table((r - 1) * rowW + i) & 0xff else 0
            e(r * (rowW + 1) + 1 + i) = (((table(r * rowW + i) & 0xff) - up) & 0xff).toByte
            i += 1
          }
          r += 1
        }
        e
      }
    val zx = deflate(enc)
    val parms = if (predictor) " /DecodeParms << /Predictor 12 /Columns 4 >>" else ""
    w(s"9 0 obj\n<< /Type /XRef /Size 10 /W [1 2 1] /Root 1 0 R$parms " +
      s"/Length ${zx.length} /Filter /FlateDecode >>\nstream\n")
    out.write(zx, 0, zx.length)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
