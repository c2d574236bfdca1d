package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DOCX text extraction — the office-document leg of the crawl
  * extraction chain beside HTML and PDF: walk the ZIP container from
  * the end-of-central-directory record (central directory entries →
  * local headers), inflate `word/document.xml` (STORED and DEFLATE
  * methods, CRC-verified), and reduce WordprocessingML to text — all
  * `<w:t>` run contents concatenated per `<w:p>` paragraph, paragraphs
  * joined with newlines, the five XML entities unescaped. NULL for
  * anything not cleanly walkable (bad magic/EOCD, torn entries, CRC
  * mismatch, missing document.xml, malformed XML nesting) — never
  * throws (ParserFuzzSpec).
  *
  * Scale: one codegen'd projection over the payload scan — the zip walk
  * touches exactly the central directory plus the one entry it needs;
  * payloads never shuffle.
  */
case class DocxText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_docx_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = DocxText.extract(input.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("docxTextImpl", DocxText,
        DocxText.getClass.getName)
      val tmp = ctx.freshName("dxt")
      s"""
        |String $tmp = $impl.extract($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($tmp); }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DocxText =
    copy(child = newChild)
}

object DocxText {

  private val MaxEntry = 64 << 20 // bytes per inflated entry
  private object Bad extends RuntimeException with scala.util.control.NoStackTrace
  private def bad(): Nothing = throw Bad

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Extracted text, or null on anything unclean. Never throws. */
  def extract(b: Array[Byte]): String =
    try {
      if (b == null || b.length < 22) return null
      val xml = entryBytes(b, "word/document.xml")
      if (xml == null) return null
      wmlToText(new String(xml, "UTF-8"))
    } catch { case Bad => null; case scala.util.control.NonFatal(_) => null }

  /** One entry's verified bytes via the central-directory walk. */
  private def entryBytes(b: Array[Byte], want: String): Array[Byte] = {
    // EOCD: scan backwards (comments can pad up to 64 KiB)
    var eocd = -1
    var i = b.length - 22
    val floor = math.max(0, b.length - 22 - 65535)
    while (i >= floor && eocd < 0) {
      if (b(i) == 0x50 && b(i + 1) == 0x4b && b(i + 2) == 0x05 && b(i + 3) == 0x06)
        eocd = i
      i -= 1
    }
    if (eocd < 0) bad()
    val nEntries = le16(b, eocd + 10)
    val cdOff = le32(b, eocd + 16)
    if (nEntries > 4096 || cdOff < 0 || cdOff > b.length) bad()
    var pos = cdOff.toInt
    var e = 0
    while (e < nEntries) {
      if (pos + 46 > b.length) bad()
      if (le32(b, pos) != 0x02014b50L) bad()
      val method = le16(b, pos + 10)
      val crc = le32(b, pos + 16)
      val csize = le32(b, pos + 20)
      val usize = le32(b, pos + 24)
      val nameLen = le16(b, pos + 28)
      val extraLen = le16(b, pos + 30)
      val commentLen = le16(b, pos + 32)
      val localOff = le32(b, pos + 42)
      if (pos + 46 + nameLen > b.length) bad()
      val name = new String(b, pos + 46, nameLen, "UTF-8")
      if (name == want) {
        if (csize > MaxEntry || usize > MaxEntry) bad()
        // local header: its own name/extra lengths govern the data offset
        val lp = localOff.toInt
        if (lp < 0 || lp + 30 > b.length) bad()
        if (le32(b, lp) != 0x04034b50L) bad()
        val lNameLen = le16(b, lp + 26)
        val lExtraLen = le16(b, lp + 28)
        val dataAt = lp + 30 + lNameLen + lExtraLen
        if (dataAt + csize > b.length) bad()
        val comp = java.util.Arrays.copyOfRange(b, dataAt, dataAt + csize.toInt)
        val out = method match {
          case 0 => comp
          case 8 =>
            val inf = new java.util.zip.Inflater(true) // raw deflate
            try {
              inf.setInput(comp)
              val buf = new java.io.ByteArrayOutputStream(
                math.min(usize.toInt.max(64), MaxEntry))
              val chunk = new Array[Byte](8192)
              while (!inf.finished()) {
                val n = inf.inflate(chunk)
                if (n == 0 && inf.needsInput()) bad() // torn stream
                buf.write(chunk, 0, n)
                if (buf.size() > MaxEntry) bad()
              }
              buf.toByteArray
            } finally inf.end()
          case _ => bad() // unsupported compression method
        }
        if (out.length.toLong != usize) bad()
        val c = new java.util.zip.CRC32
        c.update(out)
        if (c.getValue != crc) bad()
        return out
      }
      pos += 46 + nameLen + extraLen + commentLen
      e += 1
    }
    null // entry absent
  }

  /** WordprocessingML → text: `<w:t>` runs concatenated per paragraph,
    * paragraphs joined with `\n`, entities unescaped.
    */
  private def wmlToText(xml: String): String = {
    val paras = new scala.collection.mutable.ArrayBuffer[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < xml.length) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = xml.length }
      else {
        val gt = xml.indexOf('>', lt)
        if (gt < 0) bad()
        val tag = xml.substring(lt + 1, gt)
        if (tag == "w:t" || tag.startsWith("w:t ")) {
          val close = xml.indexOf("</w:t>", gt + 1)
          if (close < 0) bad()
          sb.append(unescape(xml.substring(gt + 1, close)))
          i = close + 6
        } else if (tag == "/w:p") {
          paras += sb.toString
          sb.setLength(0)
          i = gt + 1
        } else if (tag.startsWith("w:br") || tag.startsWith("w:cr")) {
          sb.append('\n')
          i = gt + 1
        } else i = gt + 1
      }
    }
    if (sb.length() > 0) paras += sb.toString
    paras.filter(_.nonEmpty).mkString("\n")
  }

  /** Single left-to-right pass (the sequential-replace trap: `&amp;lt;`
    * must decode to the literal text `&lt;`, never re-unescape).
    */
  private def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        if (s.startsWith("&lt;", i)) { sb.append('<'); i += 4 }
        else if (s.startsWith("&gt;", i)) { sb.append('>'); i += 4 }
        else if (s.startsWith("&amp;", i)) { sb.append('&'); i += 5 }
        else if (s.startsWith("&quot;", i)) { sb.append('"'); i += 6 }
        else if (s.startsWith("&apos;", i)) { sb.append(39.toChar); i += 6 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

/** Deterministic synthetic DOCX generator over a long id column (fixture
  * corpora only — see [[DocxFixture]] for the modes).
  */
case class SyntheticDocx(child: Expression, mode: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_synthetic_docx"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if DocxFixture.Modes.contains(mode) => TypeCheckSuccess
    case LongType => TypeCheckFailure(
      s"$prettyName: unknown mode '$mode' (expected one of ${DocxFixture.Modes.mkString(", ")})")
    case dt => TypeCheckFailure(
      s"$prettyName requires a long id argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    DocxFixture.build(input.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = s"${DocxFixture.getClass.getName.stripSuffix("$")}$$.MODULE$$"
      s"${ev.value} = $impl.build($v, \"$mode\");"
    })

  override protected def withNewChildInternal(newChild: Expression): SyntheticDocx =
    copy(child = newChild)
}

/** Real ZIP containers (local headers, central directory, EOCD, CRCs)
  * holding deterministic WordprocessingML — multiple runs per paragraph,
  * an `xml:space="preserve"` run, escaped entities, and sibling entries
  * ([Content_Types].xml before, styles after) so the central-directory
  * walk is exercised, not just a single-entry shortcut.
  */
object DocxFixture {

  val Modes: Set[String] = Set("deflated", "stored", "multi", "truncated", "garbage")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** The text [[DocxText]] extracts from a clean fixture of `id` — the
    * contract DocxSpec and the SQL oracle both re-derive.
    */
  def expectedText(id: Long): String = {
    def h(k: Int) = md5hex(s"$id|dx$k")
    s"docx ${h(0)}\nruns ${h(1)} joined\nesc <&> \"q\" 'a'\ntail ${h(2)}"
  }

  private def documentXml(id: Long): String = {
    def h(k: Int) = md5hex(s"$id|dx$k")
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
<w:body>
<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>docx </w:t></w:r><w:r><w:t>${h(0)}</w:t></w:r></w:p>
<w:p><w:r><w:t>runs ${h(1)}</w:t></w:r><w:r><w:t xml:space="preserve"> joined</w:t></w:r></w:p>
<w:p><w:r><w:t>esc &lt;&amp;&gt; &quot;q&quot; &apos;a&apos;</w:t></w:r></w:p>
<w:p/>
<w:p><w:r><w:t>tail ${h(2)}</w:t></w:r></w:p>
</w:body>
</w:document>"""
  }

  def build(id: Long, mode: String): Array[Byte] = mode match {
    case "deflated" => zip(Seq("word/document.xml" -> documentXml(id)), deflate = true)
    case "stored" => zip(Seq("word/document.xml" -> documentXml(id)), deflate = false)
    case "multi" => zip(Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""",
      "word/document.xml" -> documentXml(id),
      "word/styles.xml" -> """<?xml version="1.0"?><w:styles/>"""), deflate = true)
    case "truncated" =>
      val full = build(id, "deflated")
      java.util.Arrays.copyOfRange(full, 0, full.length / 2)
    case "garbage" =>
      java.security.MessageDigest.getInstance("MD5").digest(s"$id|dxjunk".getBytes("UTF-8"))
    case other => throw new IllegalArgumentException(s"synthetic_docx: unknown mode '$other'")
  }

  private def zip(entries: Seq[(String, String)], deflate: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    case class E(name: String, crc: Long, csize: Int, usize: Int, method: Int, off: Int)
    val recs = entries.map { case (name, text) =>
      val data = text.getBytes("UTF-8")
      val crc = { val c = new java.util.zip.CRC32; c.update(data); c.getValue }
      val comp =
        if (!deflate) data
        else {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          try {
            d.setInput(data); d.finish()
            val buf = new java.io.ByteArrayOutputStream(data.length)
            val chunk = new Array[Byte](8192)
            while (!d.finished()) buf.write(chunk, 0, d.deflate(chunk))
            buf.toByteArray
          } finally d.end()
        }
      val off = out.size()
      val nameB = name.getBytes("UTF-8")
      w32(0x04034b50L); w16(20); w16(0); w16(if (deflate) 8 else 0)
      w16(0); w16(0) // time, date
      w32(crc); w32(comp.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(comp)
      E(name, crc, comp.length, data.length, if (deflate) 8 else 0, off)
    }
    val cdOff = out.size()
    recs.foreach { r =>
      val nameB = r.name.getBytes("UTF-8")
      w32(0x02014b50L); w16(20); w16(20); w16(0); w16(r.method)
      w16(0); w16(0)
      w32(r.crc); w32(r.csize.toLong); w32(r.usize.toLong)
      w16(nameB.length); w16(0); w16(0); w16(0); w16(0)
      w32(0L); w32(r.off.toLong)
      out.write(nameB)
    }
    val cdSize = out.size() - cdOff
    w32(0x06054b50L); w16(0); w16(0); w16(recs.length); w16(recs.length)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    out.toByteArray
  }
}
