package graft.functions.expressions

import graft.SparkSpec

/** The WARC record parser: hand-parse differential, the binary-safe-body
  * case regex splitting cannot do (a body CONTAINING the record
  * separator), case-insensitive headers, strict all-or-nothing totality
  * on malformed payloads, and a byte-mutation fuzz.
  */
class WarcSpec extends SparkSpec {

  private def rec(
      uri: String, body: Array[Byte],
      typ: String = "response", ctype: String = "text/html",
      extraHeader: String = ""): Array[Byte] = {
    val h = s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Type: $ctype\r\n${extraHeader}Content-Length: ${body.length}\r\n\r\n"
    h.getBytes("ISO-8859-1") ++ body ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def fields(row: org.apache.spark.sql.catalyst.InternalRow)
      : (String, String, String, Long, Array[Byte]) = (
    Option(row.getUTF8String(0)).map(_.toString).orNull,
    Option(row.getUTF8String(1)).map(_.toString).orNull,
    Option(row.getUTF8String(2)).map(_.toString).orNull,
    row.getLong(3),
    row.getBinary(4))

  test("multi-record payloads parse field-exact, bodies verbatim") {
    val b1 = "hello world".getBytes("UTF-8")
    val b2 = Array[Byte](0, 1, 2, -1, -2)
    val payload = rec("https://a.test/1", b1) ++
      rec("https://a.test/2", b2, typ = "request", ctype = "application/http")
    val arr = WarcRecords.parse(payload)
    assert(arr != null && arr.numElements == 2)
    val r1 = fields(arr.getStruct(0, 5))
    assert(r1 == (("response", "https://a.test/1", "text/html", b1.length.toLong, r1._5)))
    assert(java.util.Arrays.equals(r1._5, b1))
    val r2 = fields(arr.getStruct(1, 5))
    assert(r2._1 == "request" && r2._3 == "application/http")
    assert(java.util.Arrays.equals(r2._5, b2), "binary bodies must survive verbatim")
  }

  test("a body CONTAINING the record separator parses correctly (Content-Length-driven)") {
    val tricky = "first\r\n\r\nsecond\r\n\r\n".getBytes("ISO-8859-1")
    val payload = rec("https://a.test/t", tricky) ++
      rec("https://a.test/after", "tail".getBytes("UTF-8"))
    val arr = WarcRecords.parse(payload)
    assert(arr != null && arr.numElements == 2,
      "the separator INSIDE the body must not split the record")
    assert(java.util.Arrays.equals(arr.getStruct(0, 5).getBinary(4), tricky))
    assert(new String(arr.getStruct(1, 5).getBinary(4), "UTF-8") == "tail")
  }

  test("header names are case-insensitive; unknown headers are ignored") {
    val body = "x".getBytes("UTF-8")
    val h = ("WARC/1.1\r\nwarc-type: metadata\r\nWARC-TARGET-URI: u:1\r\n" +
      "X-Unknown: whatever\r\ncontent-length: 1\r\nCONTENT-TYPE: t/x\r\n\r\n")
      .getBytes("ISO-8859-1")
    val arr = WarcRecords.parse(h ++ body ++ "\r\n\r\n".getBytes("ISO-8859-1"))
    assert(arr != null && arr.numElements == 1)
    val r = fields(arr.getStruct(0, 5))
    assert(r._1 == "metadata" && r._2 == "u:1" && r._3 == "t/x" && r._4 == 1L)
  }

  test("strict totality: any malformation NULLs the whole payload, never a partial parse") {
    val good = rec("https://a.test/1", "abc".getBytes("UTF-8"))
    // torn tail after a good record: all-or-nothing
    val torn = good ++ rec("https://a.test/2", "defgh".getBytes("UTF-8")).dropRight(9)
    assert(WarcRecords.parse(torn) == null, "a torn tail must NULL the whole payload")
    // missing Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n" + "xx\r\n\r\n").getBytes("ISO-8859-1")
    assert(WarcRecords.parse(noLen) == null)
    // non-numeric and negative Content-Length
    Seq("abc", "-5", "99999999999999999999").foreach { bad =>
      val p = (s"WARC/1.0\r\nContent-Length: $bad\r\n\r\nxx\r\n\r\n").getBytes("ISO-8859-1")
      assert(WarcRecords.parse(p) == null, s"Content-Length '$bad' must NULL")
    }
    // length pointing past the payload
    val past = ("WARC/1.0\r\nContent-Length: 999\r\n\r\nshort\r\n\r\n").getBytes("ISO-8859-1")
    assert(WarcRecords.parse(past) == null)
    // missing record terminator after the body
    val noTerm = ("WARC/1.0\r\nContent-Length: 2\r\n\r\nab").getBytes("ISO-8859-1")
    assert(WarcRecords.parse(noTerm) == null)
    // wrong magic / empty
    assert(WarcRecords.parse("WARC/2.0\r\n\r\nx".getBytes("ISO-8859-1")) == null)
    assert(WarcRecords.parse(Array.emptyByteArray) == null)
    assert(WarcRecords.parse(null) == null)
  }

  test("byte-mutation fuzz: flipped/truncated shards never throw") {
    val base = (0 until 5).toArray.flatMap(i =>
      rec(s"https://f.test/$i", s"body-$i-content".getBytes("UTF-8")))
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 500).foreach { k =>
      val h = md.digest(s"wz$k".getBytes("UTF-8"))
      val off = (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % base.length + base.length) % base.length
      val mut = base.clone()
      mut(off) = (mut(off) ^ h(2)).toByte
      WarcRecords.parse(mut) // null or a full parse, never throws
      val cut = ((h(3) & 0xff) << 8 | (h(4) & 0xff)) % base.length
      WarcRecords.parse(java.util.Arrays.copyOf(base, cut))
    }
  }

  test(".warc.gz shards parse identically: per-record gzip members AND one whole-shard member") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(b); g.close()
      out.toByteArray
    }
    val b1 = "hello gz".getBytes("UTF-8")
    val b2 = Array[Byte](9, 8, -1, 0, 7)
    val r1 = rec("https://gz.test/1", b1)
    val r2 = rec("https://gz.test/2", b2, typ = "request")
    val plain = WarcRecords.parse(r1 ++ r2)
    assert(plain != null && plain.numElements == 2)
    // the Common Crawl layout: EACH RECORD its own gzip member, members
    // concatenated — and the single-member whole-shard variant
    Seq(gz(r1) ++ gz(r2), gz(r1 ++ r2)).foreach { shard =>
      val got = WarcRecords.parse(shard)
      assert(got != null && got.numElements == 2, "gz shard must parse")
      (0 until 2).foreach { i =>
        val p = fields(plain.getStruct(i, 5)); val g = fields(got.getStruct(i, 5))
        assert(p._1 == g._1 && p._2 == g._2 && p._3 == g._3 && p._4 == g._4)
        assert(java.util.Arrays.equals(p._5, g._5), s"record $i body must match plain")
      }
    }
    // torn gzip: NULL, never a throw (strict totality carries over)
    val torn = gz(r1 ++ r2)
    assert(WarcRecords.parse(java.util.Arrays.copyOf(torn, torn.length / 2)) == null)
    // gzip of garbage: inflates fine, fails the WARC magic -> NULL
    assert(WarcRecords.parse(gz("not a warc".getBytes("UTF-8"))) == null)
  }
}
