package graft.functions.expressions

import graft.SparkSpec

/** PDF text extraction: byte-exact round trips against the fixture
  * contract for compressed and raw content streams, operator coverage
  * (Tj/TJ/'/Td, escapes, hex strings, page joins), strict totality on
  * torn/garbage/xref-stream payloads, and a mutation fuzz over real
  * PDFs.
  */
class PdfSpec extends SparkSpec {

  test("extraction is byte-exact against the fixture contract across ALL four encodings") {
    (0L until 30L).foreach { id =>
      val want = PdfFixture.expectedText(id)
      // classic table (Flate + raw streams) AND the PDF-1.5 shape
      // (object streams + cross-reference stream, with and without the
      // PNG Up predictor pre-filter)
      Seq("flate", "raw", "modern", "modernpred").foreach { m =>
        val got = PdfText.extract(PdfFixture.build(id, m))
        assert(got == want, s"id=$id mode=$m:\nwant: $want\ngot:  $got")
      }
    }
  }

  test("Type0/Identity-H CID text decodes through the ToUnicode CMap to the SAME contract text") {
    (0L until 30L).foreach { id =>
      // page 1 shows 2-byte CID codes (bfchar private-use + bfrange
      // ASCII identity) with a mid-page Tf switch back to the simple
      // font; page 2 stays simple-font — the output must be identical
      // to the single-byte encodings'
      val got = PdfText.extract(PdfFixture.build(id, "cid"))
      assert(got == PdfFixture.expectedText(id), s"id=$id cid:\ngot: $got")
      assert(PdfText.extract(PdfFixture.build(id, "cidtrunc")) == null,
        s"id=$id torn CID must extract NULL")
    }
  }

  test("ToUnicode parser: bfrange array form, last-unit increment, malformed declines") {
    def cmap(body: String): Array[Byte] =
      s"begincmap\n$body\nendcmap".getBytes("ISO-8859-1")
    val arr = PdfText.parseToUnicode(cmap(
      "1 beginbfrange\n<0001> <0003> [<0041> <0042 0043> <0044>]\nendbfrange"))
    assert(arr == Map(1 -> "A", 2 -> "BC", 3 -> "D"))
    val inc = PdfText.parseToUnicode(cmap(
      "1 beginbfrange\n<0010> <0012> <0061>\nendbfrange"))
    assert(inc == Map(0x10 -> "a", 0x11 -> "b", 0x12 -> "c"))
    intercept[Throwable] { // hi < lo
      PdfText.parseToUnicode(cmap("1 beginbfrange\n<0005> <0001> <0041>\nendbfrange"))
    }
    intercept[Throwable] { // dangling bfchar src without dst
      PdfText.parseToUnicode(cmap("1 beginbfchar\n<0001>\nendbfchar"))
    }
  }

  test("the contract covers every interpreted operator class") {
    val t = PdfFixture.expectedText(1L)
    assert(t.contains("pdf "), "Tj literal")
    assert(t.contains("kern "), "TJ array with kerning numbers dropped")
    assert(t.contains("esc ( ) \\ end"), "escape set")
    assert(t.contains("hex "), "hex string")
    assert(t.split("\n").length == 6, "Td/' line breaks and the page join")
    assert(t.contains("page2 ") && t.contains("more "), "second page via ' operator")
  }

  test("torn / garbage / xref-stream payloads extract NULL, never throw") {
    (0L until 40L).foreach { id =>
      Seq("truncated", "garbage", "xrefstream").foreach { m =>
        assert(PdfText.extract(PdfFixture.build(id, m)) == null,
          s"$m fixture $id must extract NULL")
      }
    }
    assert(PdfText.extract(null) == null)
    assert(PdfText.extract(Array.emptyByteArray) == null)
  }

  test("byte-mutation fuzz over real PDFs never throws") {
    val rnd = new scala.util.Random(20260820L)
    val bases = Seq(
      PdfFixture.build(1L, "flate"), PdfFixture.build(2L, "raw"),
      PdfFixture.build(3L, "modern"), PdfFixture.build(4L, "modernpred"),
      // CID shape: mutations land in the Type0 font dict, the ToUnicode
      // CMap stream, and 2-byte hex show strings (r16)
      PdfFixture.build(5L, "cid"))
    var i = 0
    while (i < 3000) {
      val b = bases(rnd.nextInt(bases.length)).clone()
      rnd.nextInt(4) match {
        case 0 =>
          PdfText.extract(java.util.Arrays.copyOfRange(b, 0, rnd.nextInt(b.length + 1)))
        case 1 =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          PdfText.extract(b)
        case 2 =>
          val other = bases(rnd.nextInt(bases.length))
          val cut = rnd.nextInt(math.min(b.length, other.length))
          PdfText.extract(b.take(cut) ++ other.drop(cut))
        case _ =>
          val at = rnd.nextInt(b.length)
          b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
          PdfText.extract(b)
      }
      i += 1
    }
  }

  test("the expression evaluates under codegen inside a query") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftnative.NativeColumns.{pdfText, syntheticPdf}
    val got = (0L until 10L).toDF("id")
      .select(col("id"), pdfText(syntheticPdf(col("id"), "flate")).as("txt"))
      .as[(Long, String)].collect().toMap
    (0L until 10L).foreach(id => assert(got(id) == PdfFixture.expectedText(id)))
  }
}
