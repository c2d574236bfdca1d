package graft.functions.expressions

import graft.SparkSpec

/** [[DocxText]]: the extraction contract over every fixture mode, zip
  * machinery details (stored vs deflated, multi-entry central-directory
  * walk, CRC verification), entity unescaping, and never-throw totality
  * under mutation/truncation fuzz.
  */
class DocxSpec extends SparkSpec {

  test("deflated, stored, and multi-entry containers all extract the exact contract text") {
    (0L until 30L).foreach { id =>
      val want = DocxFixture.expectedText(id)
      Seq("deflated", "stored", "multi").foreach { m =>
        val got = DocxText.extract(DocxFixture.build(id, m))
        assert(got == want, s"id $id mode $m:\n got=$got\nwant=$want")
      }
    }
  }

  test("entity unescape is single-pass (literal &amp;lt; survives as &lt;)") {
    // hand-build a document whose run contains doubly-escaped text
    val xml = """<?xml version="1.0"?><w:document><w:body>
      <w:p><w:r><w:t>a &amp;lt; b &amp;amp; c</w:t></w:r></w:p>
      </w:body></w:document>"""
    val bytes = DocxFixtureTestHook.zipSingle("word/document.xml", xml)
    assert(DocxText.extract(bytes) == "a &lt; b &amp; c")
  }

  test("a corrupted byte fails the CRC and declines to NULL (no partial text)") {
    val good = DocxFixture.build(7L, "stored")
    assert(DocxText.extract(good) != null)
    // flip one byte inside the stored document.xml payload
    val idx = {
      val s = new String(good, "ISO-8859-1")
      s.indexOf("docx ") + 2
    }
    assert(idx > 2)
    val bad = good.clone(); bad(idx) = (bad(idx) ^ 0x01).toByte
    assert(DocxText.extract(bad) == null, "CRC mismatch must decline, not mis-extract")
  }

  test("containers without word/document.xml, torn, and garbage inputs are NULL") {
    assert(DocxText.extract(DocxFixtureTestHook.zipSingle("other.xml", "<a/>")) == null)
    (0L until 10L).foreach { id =>
      assert(DocxText.extract(DocxFixture.build(id, "truncated")) == null)
      assert(DocxText.extract(DocxFixture.build(id, "garbage")) == null)
    }
  }

  test("fuzz: byte mutations and truncations never throw") {
    val rnd = new scala.util.Random(11)
    val base = DocxFixture.build(3L, "multi")
    (0 until 400).foreach { _ =>
      val m = base.clone()
      (0 until 1 + rnd.nextInt(4)).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      DocxText.extract(m)
    }
    (1 until base.length by 5).foreach(n =>
      DocxText.extract(java.util.Arrays.copyOf(base, n)))
  }

  test("column surface: expression extracts over a corpus frame") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftnative.NativeColumns.{docxText, syntheticDocx}
    import spark.implicits._
    val got = (0L until 10L).toDF("id")
      .select(col("id"), docxText(syntheticDocx(col("id"), "deflated")).as("t"))
      .as[(Long, String)].collect().toMap
    (0L until 10L).foreach(id => assert(got(id) == DocxFixture.expectedText(id)))
  }
}

/** Test-only access to the fixture's zip writer for hand-built XML. */
object DocxFixtureTestHook {
  def zipSingle(name: String, xml: String): Array[Byte] = {
    // reuse the fixture path: build a one-entry STORED zip by hand
    val data = xml.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    val crc = { val c = new java.util.zip.CRC32; c.update(data); c.getValue }
    val nameB = name.getBytes("UTF-8")
    w32(0x04034b50L); w16(20); w16(0); w16(0); w16(0); w16(0)
    w32(crc); w32(data.length.toLong); w32(data.length.toLong)
    w16(nameB.length); w16(0); out.write(nameB); out.write(data)
    val cdOff = out.size()
    w32(0x02014b50L); w16(20); w16(20); w16(0); w16(0); w16(0); w16(0)
    w32(crc); w32(data.length.toLong); w32(data.length.toLong)
    w16(nameB.length); w16(0); w16(0); w16(0); w16(0); w32(0L); w32(0L)
    out.write(nameB)
    val cdSize = out.size() - cdOff
    w32(0x06054b50L); w16(0); w16(0); w16(1); w16(1)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    out.toByteArray
  }
}
