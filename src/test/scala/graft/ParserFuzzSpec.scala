package graft

import graft.functions.expressions.{DecodeStats, ImageDims, WavMeta}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Randomized never-throws fuzz over the binary header parsers.
  *
  * The r7 adversarial cases (Int.MaxValue RIFF chunk sizes,
  * unsigned-overflow rates, JPEG fill bytes) were input-specific
  * regression tests; this locks the general contract permanently:
  * for ANY byte payload — well-formed, truncated, bit-flipped, spliced,
  * or pure noise — `ImageDims.parse` / `WavMeta.parse` return a
  * well-shaped row or null and NEVER throw, and `DecodeStats.stats`
  * always returns a full row (corrupt rows are data, not errors, in a
  * corpus-scale ingest — one poison payload must not kill a 100 TB job).
  *
  * Pure companion-object calls — the exact code the codegen'd and
  * interpreted expression paths both delegate to (ImageDims.doGenCode
  * calls `parse` via an addReferenceObj handle) — so thousands of cases
  * run in milliseconds with no Spark jobs.
  */
class ParserFuzzSpec extends AnyFunSuite {

  // -- plain-Scala twins of Multimodal.syntheticImages/syntheticWavs ------
  // (independent byte builders, so a generator bug can't mask a parser bug)

  private def be32(x: Long): Array[Byte] =
    Array(((x >> 24) & 0xff).toByte, ((x >> 16) & 0xff).toByte,
      ((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
  private def be16(x: Long): Array[Byte] =
    Array(((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
  private def le32(x: Long): Array[Byte] =
    Array((x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
      ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)
  private def le16(x: Long): Array[Byte] =
    Array((x & 0xff).toByte, ((x >> 8) & 0xff).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def pngOf(w: Long, h: Long): Array[Byte] =
    bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ ascii("IHDR") ++ be32(w) ++ be32(h) ++ bytes(8, 2, 0, 0, 0)

  private def jpegOf(w: Long, h: Long, comLens: Seq[Int]): Array[Byte] = {
    val app0 = bytes(0xff, 0xe0, 0x00, 0x10) ++ ascii("JFIF") ++
      bytes(0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val coms = comLens.flatMap(n =>
      bytes(0xff, 0xfe) ++ be16(n + 2) ++ Array.fill(n)('x'.toByte)).toArray
    val sof = bytes(0xff, 0xc0, 0x00, 0x11, 0x08) ++ be16(h) ++ be16(w) ++
      bytes(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    bytes(0xff, 0xd8) ++ app0 ++ coms ++ sof
  }

  private def wavOf(rate: Long, channels: Long, bits: Long, dataLen: Long,
      listPad: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val byteRate = rate * math.max(blockAlign, 1)
    val list =
      if (listPad <= 0) Array.emptyByteArray
      else ascii("LIST") ++ le32(listPad.toLong) ++ Array.fill(listPad)('x'.toByte)
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(byteRate) ++ le16(blockAlign) ++ le16(bits)
    ascii("RIFF") ++ le32(dataLen + 36) ++ ascii("WAVE") ++ list ++ fmt ++
      ascii("data") ++ le32(dataLen)
  }

  private def be64b(x: Long): Array[Byte] = be32(x >>> 32) ++ be32(x & 0xffffffffL)

  private def mp4Of(ts: Long, dur: Long, v1: Boolean, largesize: Boolean,
      freePad: Int, udtaPad: Int): Array[Byte] = {
    val ftyp = be32(16) ++ ascii("ftyp") ++ ascii("isom") ++ be32(0)
    val free =
      if (freePad <= 0) Array.emptyByteArray
      else be32(freePad + 8L) ++ ascii("free") ++ Array.fill(freePad)('x'.toByte)
    val udta =
      if (udtaPad <= 0) Array.emptyByteArray
      else be32(udtaPad + 8L) ++ ascii("udta") ++ Array.fill(udtaPad)('u'.toByte)
    val mvhd =
      if (v1) be32(120) ++ ascii("mvhd") ++ bytes(1, 0, 0, 0) ++
        Array.fill(16)(0.toByte) ++ be32(ts) ++ be64b(dur) ++ Array.fill(80)(0.toByte)
      else be32(108) ++ ascii("mvhd") ++ bytes(0, 0, 0, 0) ++
        Array.fill(8)(0.toByte) ++ be32(ts) ++ be32(dur) ++ Array.fill(80)(0.toByte)
    val children = udta ++ mvhd
    val moov =
      if (largesize) be32(1) ++ ascii("moov") ++ be64b(children.length + 16L) ++ children
      else be32(children.length + 8L) ++ ascii("moov") ++ children
    ftyp ++ free ++ moov
  }

  // -- generators ---------------------------------------------------------

  private val genBase: Gen[Array[Byte]] = Gen.oneOf(
    for {
      ts <- Gen.chooseNum(0L, 0xffffffffL); dur <- Gen.chooseNum(0L, Long.MaxValue / 1001)
      v1 <- Gen.oneOf(true, false); ls <- Gen.oneOf(true, false)
      fp <- Gen.chooseNum(0, 48); up <- Gen.chooseNum(0, 24)
    } yield mp4Of(ts, dur, v1, ls, fp, up),
    for { w <- Gen.chooseNum(0L, 0xffffffffL); h <- Gen.chooseNum(0L, 0xffffffffL) }
      yield pngOf(w, h),
    for {
      w <- Gen.chooseNum(0L, 0xffffL); h <- Gen.chooseNum(0L, 0xffffL)
      coms <- Gen.listOf(Gen.chooseNum(0, 40))
    } yield jpegOf(w, h, coms.take(4)),
    for {
      rate <- Gen.chooseNum(0L, 0xffffffffL); ch <- Gen.chooseNum(0L, 0xffffL)
      bits <- Gen.chooseNum(0L, 0xffffL); dl <- Gen.chooseNum(0L, 0xffffffffL)
      pad <- Gen.chooseNum(0, 64)
    } yield wavOf(rate, ch, bits, dl, pad),
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))
      .map(_.map(_.toByte).toArray)),
    Gen.const(Array.emptyByteArray))

  // -- independent FULL-PNG builder (real CRC32, real Deflater) ----------
  // exercises PngPixelHash's inflate/unfilter path against streams this
  // repo's Column-based fixture generator cannot produce

  private def crc32(bs: Array[Byte]*): Array[Byte] = {
    val c = new java.util.zip.CRC32()
    bs.foreach(c.update)
    be32(c.getValue)
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] =
    be32(data.length.toLong) ++ ascii(typ) ++ data ++ crc32(ascii(typ), data)

  /** Real zlib-deflated PNG: `filters(y)` picks each scanline's filter and
    * the filtered bytes are computed by the spec's forward transform —
    * decode must invert every one of them back to the same pixels.
    */
  private def fullPng(w: Int, h: Int, colorType: Int, px: (Int, Int) => Array[Int],
      filters: Int => Int = _ => 0): Array[Byte] = {
    val ch = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4 }
    val stride = w * ch
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val f = filters(y)
      raw(y * (1 + stride)) = f.toByte
      val cur = new Array[Int](stride)
      for (x <- 0 until w; c <- 0 until ch) cur(x * ch + c) = px(x, y)(c)
      def paeth(a: Int, b: Int, c: Int): Int = {
        val p = a + b - c
        val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      for (x <- 0 until stride) {
        // the forward filter needs the RECONSTRUCTED neighbors, which for
        // this builder are just the original pixels (cur/up of raw pixels)
        def upOrig(xx: Int) = if (y > 0) {
          val pxy = px(xx / ch, y - 1); pxy(xx % ch)
        } else 0
        def leftOrig(xx: Int) = if (xx >= ch) { val p0 = px((xx - ch) / ch, y); p0(xx % ch) } else 0
        def ulOrig(xx: Int) = if (y > 0 && xx >= ch) { val p0 = px((xx - ch) / ch, y - 1); p0(xx % ch) } else 0
        val v = f match {
          case 0 => cur(x)
          case 1 => cur(x) - leftOrig(x)
          case 2 => cur(x) - upOrig(x)
          case 3 => cur(x) - ((leftOrig(x) + upOrig(x)) >> 1)
          case _ => cur(x) - paeth(leftOrig(x), upOrig(x), ulOrig(x))
        }
        raw(y * (1 + stride) + 1 + x) = v.toByte
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++ bytes(8, colorType, 0, 0, 0)
    bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** One random corruption: truncate, bit-flip a byte, overwrite a 4-byte
    * window (hits length/size fields), splice two payloads, or append noise.
    */
  private def mutate(b: Array[Byte], other: Array[Byte], op: Int, at: Int,
      v: Byte): Array[Byte] = {
    val n = b.length
    op % 5 match {
      case 0 => b.take(if (n == 0) 0 else at % (n + 1))
      case 1 => if (n == 0) b else { val c = b.clone(); c(at % n) = v; c }
      case 2 => if (n == 0) b else {
        val c = b.clone()
        var i = 0
        while (i < 4 && (at % n) + i < n) { c((at % n) + i) = (v + i).toByte; i += 1 }
        c
      }
      case 3 => b.take(if (n == 0) 0 else at % (n + 1)) ++ other
      case _ => b ++ Array.fill(at % 16)(v)
    }
  }

  private val genCase: Gen[Array[Byte]] = for {
    base <- genBase
    other <- genBase
    nOps <- Gen.chooseNum(0, 3)
    ops <- Gen.listOfN(nOps, Gen.zip(Gen.chooseNum(0, 4),
      Gen.chooseNum(0, Int.MaxValue), Gen.chooseNum(-128, 127).map(_.toByte)))
  } yield ops.foldLeft(base) { case (acc, (op, at, v)) => mutate(acc, other, op, at, v) }

  test("parsers never throw on 3000 random corrupted payloads (null or well-shaped only)") {
    val seed = org.scalacheck.rng.Seed(20260814L)
    var s = seed
    var i = 0
    while (i < 3000) {
      val p = org.scalacheck.Gen.Parameters.default
      val payload = genCase.pureApply(p, s)
      s = s.next
      val img = ImageDims.parse(payload)
      if (img != null) {
        assert(img.numFields == 3, "image row shape")
        val fmt = img.getUTF8String(0).toString
        assert(fmt == "png" || fmt == "jpeg", s"format '$fmt'")
      }
      val wav = WavMeta.parse(payload)
      if (wav != null) {
        assert(wav.numFields == 4, "wav row shape")
        assert(wav.getInt(0) > 0 && wav.getInt(1) > 0 && wav.getInt(2) > 0,
          "accepted wav rows carry positive rate/channels/bits")
        assert(wav.getLong(3) >= 0L, "duration is non-negative")
      }
      val dec = DecodeStats.stats(payload)
      assert(dec != null && dec.numFields == 4, "decodeStats always returns a row")
      assert(dec.getLong(0) == payload.length.toLong, "byte_len")
      assert(dec.getLong(1) >= 0L, "checksum is an unsigned sum")
      val mp4 = graft.functions.expressions.Mp4Meta.parse(payload)
      if (mp4 != null) {
        assert(mp4.numFields == 4, "mp4 row shape")
        assert(mp4.getUTF8String(0).numBytes == 4, "brand is the 4-byte fourcc")
        assert(mp4.getLong(1) > 0L, "accepted timescale is positive")
        assert(mp4.getLong(2) >= 0L && mp4.getLong(3) >= 0L, "durations non-negative")
      }
      // pixel decode: null or a long, never a throw — the corpus-ingest
      // contract extends to the inflate/unfilter path
      graft.functions.expressions.PngPixelHash.hash(payload)
      // and to the JPEG marker-walk/Huffman/IDCT path
      graft.functions.expressions.JpegPixelHash.hash(payload)
      // and to the GIF LZW path and the WAV PCM-envelope path (r13)
      graft.functions.expressions.GifPixelHash.hash(payload)
      graft.functions.expressions.WavContentHash.hash(payload)
      // and to the VP8L prefix-code/transform path and the FLAC
      // subframe/Rice path (r14)
      graft.functions.expressions.WebpPixelHash.hash(payload)
      graft.functions.expressions.FlacContentHash.hash(payload)
      // and to the PDF xref/object/content-stream walk (r14)
      graft.functions.expressions.PdfText.extract(payload)
      // and to the HTTP chunked-framing reassembly (r16): null or a
      // strictly-smaller byte payload, never a throw
      val un = graft.functions.expressions.HttpChunkedDecode.decode(payload)
      if (un != null) assert(un.length <= payload.length,
        "de-chunked bytes can never exceed the framed input")
      i += 1
    }
  }

  test("HttpChunkedDecode: round-trips well-formed framings; rejects malformed ones as null") {
    import graft.functions.expressions.HttpChunkedDecode.decode
    def enc(parts: Seq[Array[Byte]], trailer: String = ""): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { p =>
        out.write(s"${p.length.toHexString}\r\n".getBytes("ISO-8859-1"))
        out.write(p); out.write("\r\n".getBytes("ISO-8859-1"))
      }
      out.write(s"0\r\n$trailer\r\n".getBytes("ISO-8859-1"))
      out.toByteArray
    }
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val parts = (0 to rnd.nextInt(4)).map { _ =>
        val b = new Array[Byte](1 + rnd.nextInt(300)); rnd.nextBytes(b); b
      }
      val whole = parts.toArray.flatten
      assert(java.util.Arrays.equals(decode(enc(parts)), whole), "plain round-trip")
      assert(java.util.Arrays.equals(
        decode(enc(parts, "X-Trailer: v\r\n")), whole), "trailer round-trip")
    }
    // chunk extension after the size; uppercase hex
    assert(new String(decode(
      "5;ext=1\r\nhello\r\n2\r\nhi\r\n0\r\n\r\n".getBytes("ISO-8859-1")),
      "ISO-8859-1") == "hellohi")
    assert(new String(decode(
      "A\r\n0123456789\r\n0\r\n\r\n".getBytes("ISO-8859-1")), "ISO-8859-1") ==
      "0123456789")
    // malformed: non-hex size, size past buffer, missing CRLFs, truncation
    assert(decode("zz\r\nhi\r\n0\r\n\r\n".getBytes("ISO-8859-1")) == null)
    assert(decode("ff\r\nshort\r\n0\r\n\r\n".getBytes("ISO-8859-1")) == null)
    assert(decode("2\r\nhiXX0\r\n\r\n".getBytes("ISO-8859-1")) == null)
    assert(decode("2\r\nhi\r\n0\r\n".getBytes("ISO-8859-1")) == null) // no final CRLF
    assert(decode(Array.emptyByteArray) == null)
  }

  test("GifPixelHash: fuzzing DECODABLE GIFs (truncations, bit flips, splices) never throws") {
    // start from real LZW streams so mutations land inside code data,
    // sub-block boundaries, and the palette
    import graft.functions.expressions.{GifFixture, GifPixelHash}
    val rnd = new scala.util.Random(20260816L)
    val bases = Seq(
      GifFixture.build(1L, "base"),
      GifFixture.build(2L, "reblock"),
      GifFixture.build(3L, "interlace"))
    var i = 0
    while (i < 2000) {
      val b = bases(rnd.nextInt(bases.length))
      val m = mutate(b, bases(rnd.nextInt(bases.length)), rnd.nextInt(5),
        rnd.nextInt(Int.MaxValue), rnd.nextInt(256).toByte)
      GifPixelHash.hash(m) // null or long, never throws
      i += 1
    }
  }

  test("WavContentHash: fuzzing DECODABLE WAVs (truncations, bit flips, splices) never throws") {
    import graft.functions.expressions.{WavContentHash, WavFixture}
    val rnd = new scala.util.Random(20260817L)
    val bases = Seq(
      WavFixture.build(1L, "base"),
      WavFixture.build(2L, "pad"),
      WavFixture.build(3L, "stereo"),
      WavFixture.build(4L, "quant8"))
    var i = 0
    while (i < 2000) {
      val b = bases(rnd.nextInt(bases.length))
      val m = mutate(b, bases(rnd.nextInt(bases.length)), rnd.nextInt(5),
        rnd.nextInt(Int.MaxValue), rnd.nextInt(256).toByte)
      WavContentHash.hash(m) // null or long, never throws
      i += 1
    }
  }

  test("JpegPixelHash: fuzzing DECODABLE JPEGs (truncations, bit flips, splices) never throws") {
    // the generic corpus rarely parses past SOI; these mutations start
    // from real baseline streams (plain, restart-framed, requantized) so
    // they land inside quant/Huffman tables and entropy data
    import graft.functions.expressions.{JpegFixture, JpegPixelHash}
    val rnd = new scala.util.Random(20260815L)
    val bases = Seq(
      JpegFixture.build(1L, "base"),
      JpegFixture.build(2L, "framing"),
      JpegFixture.build(3L, "quant"),
      // multi-scan progressive streams: mutations land in scan headers,
      // EOB-runs, and refinement correction bits (r16)
      JpegFixture.build(4L, "prog"),
      JpegFixture.build(5L, "prog"))
    var i = 0
    while (i < 2000) {
      val b = bases(rnd.nextInt(bases.length))
      val m = mutate(b, bases(rnd.nextInt(bases.length)), rnd.nextInt(5),
        rnd.nextInt(Int.MaxValue), rnd.nextInt(256).toByte)
      JpegPixelHash.hash(m) // null or long, never throws
      // a truncation that removes real entropy data (not just the EOI
      // trailer) must be rejected cleanly, never decoded partially
      if (b.length > 60) {
        val cut = b.take(10 + rnd.nextInt(b.length - 60))
        assert(JpegPixelHash.hash(cut) == null, "torn JPEGs must hash null")
      }
      i += 1
    }
  }

  test("PngPixelHash: fuzzing DECODABLE PNGs (truncations, bit flips, splices) never throws") {
    // the generic fuzz corpus rarely reaches the inflate path; this one
    // starts from real deflate streams so mutations land inside IDAT —
    // torn downloads, flipped zlib headers, sliced scanlines
    val rnd = new scala.util.Random(20260815L)
    def randPx(seed: Int)(x: Int, y: Int): Array[Int] = {
      val v = (x * 31 + y * 17 + seed * 7919) & 0xff
      Array(v, (v * 3) & 0xff, (v * 5) & 0xff, 255)
    }
    val bases = Seq(
      fullPng(16, 16, 0, randPx(1)),
      fullPng(32, 9, 2, randPx(2)),
      fullPng(9, 8, 6, randPx(3)),
      fullPng(20, 20, 4, randPx(4), filters = y => y % 5))
    var i = 0
    while (i < 2000) {
      val b = bases(rnd.nextInt(bases.length))
      val m = mutate(b, bases(rnd.nextInt(bases.length)), rnd.nextInt(5),
        rnd.nextInt(Int.MaxValue), rnd.nextInt(256).toByte)
      graft.functions.expressions.PngPixelHash.hash(m) // null or long, never throws
      // plain truncation must always be rejected cleanly
      if (b.length > 10) {
        val cut = b.take(10 + rnd.nextInt(b.length - 10))
        // cuts inside the trailer (IDAT CRC 4 + IEND 12 = last 16 bytes)
        // leave every pixel byte intact and legitimately still decode
        if (cut.length < b.length - 16)
          assert(graft.functions.expressions.PngPixelHash.hash(cut) == null,
            "truncated-IDAT PNGs must hash null")
      }
      i += 1
    }
  }

  test("PngPixelHash: re-encode invariance — ImageIO, all five filters, and stored-block encodings of the same pixels hash identically") {
    def px(x: Int, y: Int): Array[Int] = {
      val v = ((x * 131 + y * 31 + (x * y) % 7) * 37) & 0xff
      Array(v, v, v, 255)
    }
    val w = 24; val h = 16
    // (a) this repo's builder, filter 0, real deflate
    val plain = graft.functions.expressions.PngPixelHash.hash(fullPng(w, h, 0, px))
    assert(plain != null, "baseline gray PNG must decode")
    // (b) every filter type on every row — the unfilter inverse is exact
    for (f <- 0 to 4) {
      val hf = graft.functions.expressions.PngPixelHash.hash(
        fullPng(w, h, 0, px, filters = _ => f))
      assert(hf == plain, s"filter $f re-encode must hash identically")
    }
    val mixed = graft.functions.expressions.PngPixelHash.hash(
      fullPng(w, h, 0, px, filters = y => (y * 3 + 1) % 5))
    assert(mixed == plain, "mixed-filter re-encode must hash identically")
    // (c) RGB and RGBA encodings of the same gray pixels (luma(g,g,g)=g;
    // alpha ignored)
    assert(graft.functions.expressions.PngPixelHash.hash(fullPng(w, h, 2, px)) == plain)
    def pxA(x: Int, y: Int): Array[Int] = { val p = px(x, y); Array(p(0), p(1), p(2), (x * 13 + y) & 0xff) }
    assert(graft.functions.expressions.PngPixelHash.hash(fullPng(w, h, 6, pxA)) == plain,
      "alpha must not affect the pixel hash")
    assert(graft.functions.expressions.PngPixelHash.hash(fullPng(w, h, 4, pxA)) == plain,
      "gray+alpha must match gray")
    // (c2) palette encoding with an identity-gray PLTE — same pixels again
    val rawPal = new Array[Byte](h * (1 + w))
    for (y <- 0 until h) {
      rawPal(y * (1 + w)) = 0
      for (x <- 0 until w) rawPal(y * (1 + w) + 1 + x) = px(x, y)(0).toByte
    }
    val dfl = new java.util.zip.Deflater()
    dfl.setInput(rawPal); dfl.finish()
    val palOut = new java.io.ByteArrayOutputStream()
    val palBuf = new Array[Byte](4096)
    while (!dfl.finished()) palOut.write(palBuf, 0, dfl.deflate(palBuf))
    dfl.end()
    val palPng = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++ bytes(8, 3, 0, 0, 0)) ++
      chunk("PLTE", Array.tabulate(768)(i => (i / 3).toByte)) ++
      chunk("IDAT", palOut.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
    assert(graft.functions.expressions.PngPixelHash.hash(palPng) == plain,
      "identity-palette encoding must match gray")
    // (d) the INDEPENDENT encoder: javax.imageio's PNG writer (its own
    // filter heuristics, its own deflate) — the true re-encode case
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(x, y)(0)
      img.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "ImageIO must emit PNG")
    val iioHash = graft.functions.expressions.PngPixelHash.hash(bos.toByteArray)
    assert(iioHash == plain, "an ImageIO re-encode of the same pixels must hash identically")
    // (d2) the zlib stream SPLIT ACROSS MULTIPLE IDAT chunks (how real
    // encoders emit large images) must concatenate and decode identically
    val single = fullPng(w, h, 0, px)
    // locate the IDAT chunk: sig(8) + IHDR chunk (8+13+4) = offset 33
    val l = ((single(33) & 0xff) << 24) | ((single(34) & 0xff) << 16) |
      ((single(35) & 0xff) << 8) | (single(36) & 0xff)
    assert(new String(single, 37, 4, "US-ASCII") == "IDAT")
    val zdata = java.util.Arrays.copyOfRange(single, 41, 41 + l)
    val cut = zdata.length / 2
    val multi = java.util.Arrays.copyOfRange(single, 0, 33) ++
      chunk("IDAT", java.util.Arrays.copyOfRange(zdata, 0, cut)) ++
      chunk("IDAT", java.util.Arrays.copyOfRange(zdata, cut, zdata.length)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(graft.functions.expressions.PngPixelHash.hash(multi) == plain,
      "a multi-IDAT re-chunking must hash identically")
    // (e) different pixels hash differently (sanity that the hash sees content)
    val other = graft.functions.expressions.PngPixelHash.hash(
      fullPng(w, h, 0, (x, y) => Array((255 - ((x * 131 + y * 31) & 0xff)) & 0xff, 0, 0, 255)))
    assert(other != plain)
    // (f) rejected shapes: interlaced, 16-bit, tiny, oversized header
    val inter = fullPng(w, h, 0, px)
    inter(28) = 1 // IHDR interlace byte
    assert(graft.functions.expressions.PngPixelHash.hash(inter) == null)
    val deep = fullPng(w, h, 0, px)
    deep(24) = 16 // IHDR bit depth
    assert(graft.functions.expressions.PngPixelHash.hash(deep) == null)
    assert(graft.functions.expressions.PngPixelHash.hash(fullPng(8, 7, 0, px)) == null,
      "below the 9x8 grid floor the byte fingerprint family applies")
  }

  test("well-formed payloads still parse after the fuzz generators are composed (sanity)") {
    // guards against the fuzz harness accidentally only ever producing
    // garbage — the acceptance paths must be reachable from the builders
    val img = ImageDims.parse(pngOf(640, 480))
    assert(img != null && img.getInt(1) == 640 && img.getInt(2) == 480)
    val jp = ImageDims.parse(jpegOf(123, 45, Seq(7, 3)))
    assert(jp != null && jp.getInt(1) == 123 && jp.getInt(2) == 45)
    val wv = WavMeta.parse(wavOf(16000, 2, 16, 32000, 10))
    assert(wv != null && wv.getInt(0) == 16000 && wv.getInt(1) == 2 &&
      wv.getInt(2) == 16 && wv.getLong(3) == 32000L * 1000 / (16000L * 4))
    // mp4: every structural variant the generator can emit must accept —
    // v0/v1 offsets, largesize headers, free/udta padding
    for (v1 <- Seq(false, true); ls <- Seq(false, true)) {
      val dur = if (v1) 4294967296L + 777L else 777L
      val m = graft.functions.expressions.Mp4Meta.parse(
        mp4Of(600L, dur, v1, ls, freePad = 12, udtaPad = 6))
      assert(m != null, s"v1=$v1 ls=$ls must parse")
      assert(m.getUTF8String(0).toString == "isom" && m.getLong(1) == 600L &&
        m.getLong(2) == dur && m.getLong(3) == dur * 1000L / 600L, s"v1=$v1 ls=$ls")
    }
  }

  test("DecodeNumericRefs: agrees with an independent regex decoder on 2000 random ref soups; never throws") {
    import graft.functions.expressions.DecodeNumericRefs
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val expr = DecodeNumericRefs(Literal("x"))
    def decode(s: String): String =
      expr.nullSafeEval(UTF8String.fromString(s)).asInstanceOf[UTF8String].toString
    // independent reference: regex-driven appendReplacement with the same
    // validity rules (a different algorithm shape, so a scanner bug and a
    // generator bug can't cancel out)
    val pat = java.util.regex.Pattern
      .compile("&#([0-9]{1,8});|&#[xX]([0-9a-fA-F]{1,8});")
    def ref(s: String): String = {
      val m = pat.matcher(s)
      val sb = new StringBuffer
      while (m.find()) {
        val cp =
          if (m.group(1) != null) java.lang.Long.parseLong(m.group(1))
          else java.lang.Long.parseLong(m.group(2), 16)
        val rep =
          if (cp >= 1 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
            new String(Character.toChars(cp.toInt))
          else m.group(0)
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
      }
      m.appendTail(sb)
      sb.toString
    }
    val piece = Gen.oneOf(
      Gen.oneOf("&#", ";", "x", "X", "&", "#", "", " ", "abc", "&amp;"),
      Gen.chooseNum(0, 1200000).map(n => s"&#$n;"),
      Gen.chooseNum(0, 0x120000).map(n => s"&#x${n.toHexString};"),
      Gen.chooseNum(0xD800, 0xDFFF).map(n => s"&#$n;"), // surrogate: literal
      Gen.listOfN(12, Gen.numChar).map(ds => s"&#${ds.mkString};"), // overflow
      Gen.oneOf("&#65", "&#x", "&#;", "&#zz;", "ὠ0&#38;"))
    val docGen = Gen.listOf(piece).map(_.take(10).mkString)
    var checked = 0
    Iterator.continually(docGen.sample).flatten.take(2000).foreach { s =>
      assert(decode(s) == ref(s), s"mismatch on '$s'")
      checked += 1
    }
    assert(checked == 2000)
    // pinned semantics
    assert(decode("&#65;&#x41; &#8217;") == "AA ’")
    assert(decode("&#0; &#1114112; &#55296; &#999999999999;") ==
      "&#0; &#1114112; &#55296; &#999999999999;")
  }

  test("BlockHash64: never throws, matches an independent model, twin proximity") {
    import graft.functions.expressions.BlockHash64
    // independent model: BigInt rational means per block, different loop
    // structure — a shared arithmetic slip can't hide in both
    def model(b: Array[Byte]): Long = {
      if (b.isEmpty) return 0L
      val vals = b.map(x => BigInt(x & 0xff))
      val total = vals.sum
      (0 until 64).foldLeft(0L) { (acc, i) =>
        val blk = vals.slice(i * b.length / 64, (i + 1) * b.length / 64)
        // mean(blk) > mean(all) <=> sum(blk)/|blk| > total/len
        if (blk.nonEmpty && blk.sum * b.length > total * blk.length)
          acc | (1L << i)
        else acc
      }
    }
    val payloadGen = Gen.oneOf(
      Gen.const(Array.emptyByteArray),
      Gen.choose(1, 63).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127))),
      Gen.choose(64, 4096).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127))),
      // constant runs: every block mean equals the total mean -> hash 0
      Gen.zip(Gen.choose(0, 255), Gen.choose(1, 500)).map { case (v, n) => List.fill(n)(v) })
      .map {
        case a: Array[Byte] => a
        case l: List[_] => l.map(_.asInstanceOf[Int].toByte).toArray
      }
    var checked = 0
    Iterator.continually(payloadGen.sample).flatten.take(3000).foreach { p =>
      val h = BlockHash64.hash(p) // must not throw
      assert(h == model(p), s"model mismatch on ${p.take(20).mkString(",")} (len ${p.length})")
      checked += 1
    }
    assert(checked == 3000)
    assert(BlockHash64.hash(Array.emptyByteArray) == 0L)
    assert(BlockHash64.hash(Array.fill(777)(42.toByte)) == 0L, "constant payload -> 0")
    // content edit -> small hamming: the fixture contract the near-dup
    // registry queries rely on (16-byte edit in a 256-byte body)
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val base = Array.fill(293)(rnd.nextInt(256).toByte)
      val twin = base.clone()
      val off = rnd.nextInt(base.length - 16)
      (off until off + 16).foreach(j => twin(j) = rnd.nextInt(256).toByte)
      val d = java.lang.Long.bitCount(BlockHash64.hash(base) ^ BlockHash64.hash(twin))
      assert(d <= 16, s"16-byte edit moved $d bits")
    }
  }

  test("BlockHash64.cmpProducts: exact beyond the 64-bit product range") {
    import graft.functions.expressions.BlockHash64.cmpProducts
    // the giant-payload regime the hash can't allocate in a test: products
    // near and beyond 2^63, where the old `s * len > total * blockLen`
    // wrapped. Differential check vs BigInt across adversarial operands.
    val rnd = new scala.util.Random(11)
    val interesting = Seq(0L, 1L, Int.MaxValue.toLong, 1L << 31, (1L << 39) - 1,
      255L * Int.MaxValue, 3037000499L /* ~sqrt(2^63) */, 3037000500L)
    def gen(): Long = if (rnd.nextBoolean()) interesting(rnd.nextInt(interesting.size))
      else rnd.nextLong() & ((1L << 40) - 1)
    (0 until 20000).foreach { _ =>
      val (a, b, c, d) = (gen(), gen(), gen(), gen())
      val exact = (BigInt(a) * BigInt(b)).compare(BigInt(c) * BigInt(d))
      val got = cmpProducts(a, b, c, d)
      assert(Integer.signum(got) == exact, s"cmpProducts($a,$b,$c,$d)=$got, exact $exact")
    }
    // the scaladoc's worst case: blockSum = 255*(len/64+1) at len = 2^31-1
    val len = Int.MaxValue.toLong
    val s = 255L * (len / 64 + 1)
    assert(cmpProducts(s, len, s, len) == 0)
    assert(cmpProducts(s, len, s - 1, len) > 0)
    assert(cmpProducts(s - 1, len, s, len) < 0)
  }

  test("BpeTokenize: total on random unicode words; every position consumed exactly once") {
    import graft.functions.expressions.BpeTokenize
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = Seq("ab" -> 0, "a" -> 1, "b" -> 2, "cd" -> 3, "𝄞a" -> 4)
    val expr = BpeTokenize(Literal("x"), vocab, 4)
    def tok(ws: Seq[String]): InternalRow =
      expr.nullSafeEval(new GenericArrayData(
        ws.map(w => if (w == null) null else UTF8String.fromString(w)).toArray))
        .asInstanceOf[InternalRow]
    val wordGen = Gen.listOf(Gen.oneOf(
      Gen.oneOf("a", "b", "ab", "cd", "", "𝄞", "é", "é", "ß"),
      Gen.alphaNumStr.map(_.take(6)))).map(_.take(5).mkString)
    val rowGen = Gen.listOf(Gen.option(wordGen).map(_.orNull)).map(_.take(6))
    Iterator.continually(rowGen.sample).flatten.take(1000).foreach { ws =>
      val row = tok(ws)
      val n = row.getLong(0)
      val ids = row.getArray(2)
      assert(ids.numElements() == n, s"ids length vs count on $ws")
      // greedy always advances: token count never exceeds total codepoints
      val cps = ws.filter(_ != null).map(_.codePoints().count()).sum
      assert(n <= cps, s"consumed more tokens than codepoints on $ws")
      var sum = 0L
      (0 until ids.numElements()).foreach(i => sum += ids.getInt(i))
      assert(sum == row.getLong(1), "checksum consistent with ids")
    }
  }
}
