package graft.functions.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The JPEG pixel-level near-dup family: encoder/decoder round trip,
  * re-encode twin invariants, corrupt-input totality, the ImageIO
  * differential (both our own gray fixtures AND color 4:2:0 streams
  * ImageIO itself encodes — an independent codec on both sides), and the
  * corpus operators' planted-pair surface.
  */
class JpegSpec extends SparkSpec {

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def baseHash(id: Long): Long = {
    val h = JpegPixelHash.hash(JpegFixture.build(id, "base"))
    assert(h != null, s"base fixture $id must decode")
    h.longValue()
  }

  test("framing re-encode twins (new Huffman tables, restarts, no APP0) hash IDENTICALLY") {
    (0L until 13L).foreach { id =>
      val f = JpegPixelHash.hash(JpegFixture.build(id, "framing"))
      assert(f != null, s"framing twin $id must decode")
      assert(ham(f, baseHash(id)) == 0,
        s"id $id: same coefficients re-framed must hash at Hamming exactly 0")
    }
  }

  test("requantized re-encode twins land within the pair threshold; non-twins stay far") {
    val hs = (0L until 60L).map(id => id -> baseHash(id)).toMap
    (13L until 25L).foreach { id =>
      val q = JpegPixelHash.hash(JpegFixture.build(id, "quant"))
      assert(q != null, s"quant twin $id must decode")
      val d = ham(q, hs(id))
      assert(d <= 4, s"id $id: requantized twin at Hamming $d > 4")
    }
    val nonTwin = for { i <- hs.keys; j <- hs.keys if i < j } yield ham(hs(i), hs(j))
    assert(nonTwin.min > 4,
      s"closest non-twin pair at Hamming ${nonTwin.min} — inside the pair threshold")
  }

  test("truncated / garbage / invalid-progressive variants decode to NULL, never throw") {
    (25L until 60L).foreach { id =>
      // "progressive" is the SOF2-FLIPPED base: its single scan keeps the
      // baseline Ss=0..Se=63 script, which Annex G forbids — the
      // progressive path must reject it, not misdecode it
      Seq("truncated", "garbage", "progressive").foreach { m =>
        assert(JpegPixelHash.hash(JpegFixture.build(id, m)) == null,
          s"$m fixture $id must hash NULL")
      }
    }
    assert(JpegPixelHash.hash(null) == null)
    assert(JpegPixelHash.hash(Array.emptyByteArray) == null)
  }

  test("progressive re-encode twins (SA + spectral selection) hash IDENTICALLY") {
    (0L until 25L).foreach { id =>
      val bytes = JpegFixture.build(id, "prog")
      assert((2 until bytes.length - 1).exists(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2),
        "prog fixture must carry SOF2")
      val p = JpegPixelHash.hash(bytes)
      assert(p != null, s"progressive twin $id must decode")
      assert(ham(p, baseHash(id)) == 0,
        s"id $id: same coefficients delivered progressively must hash at Hamming 0")
    }
  }

  test("torn progressive streams decode to NULL, never throw") {
    (0L until 25L).foreach { id =>
      val full = JpegFixture.build(id, "prog")
      // cut at several depths: mid-header, mid-early-scan, mid-last-scan
      Seq(full.length / 4, full.length / 2, full.length - 20).foreach { n =>
        assert(JpegPixelHash.hash(java.util.Arrays.copyOfRange(full, 0, n)) == null,
          s"prog fixture $id cut at $n must hash NULL")
      }
    }
  }

  test("ImageIO-ENCODED progressive color 4:2:0: the multi-scan path matches ImageIO's own decode") {
    // an independent encoder's scan script (libjpeg jpeg_simple_progression:
    // interleaved DC at Al=1, AC successive approximation with EOB-runs)
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + (x * 3) % 180
      val g = 200 - (y * 3) % 160
      val b = 60 + ((x + y) * 2) % 150
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose()
    val bytes = bos.toByteArray
    // prove it IS progressive: an SOF2 marker must be present
    assert((2 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2),
      "ImageIO must have emitted SOF2")
    val ours = JpegPixelHash.hash(bytes)
    assert(ours != null, "ImageIO's progressive color JPEG must decode")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val px = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      px(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
    }
    val iio = PngPixelHash.dhash(px, w, h)
    assert(ham(iio.longValue(), ours.longValue()) <= 4,
      s"progressive color JPEG: luma-dHash differential at Hamming ${ham(iio, ours)}")
  }

  test("ImageIO-ENCODED progressive grayscale JPEG matches its own decode") {
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, 30 + (x * 5 + y * 3) % 200)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose()
    val bytes = bos.toByteArray
    assert((2 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2),
      "ImageIO must have emitted SOF2")
    val ours = JpegPixelHash.hash(bytes)
    assert(ours != null, "ImageIO's progressive gray JPEG must decode")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val px = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) px(y * w + x) = back.getRaster.getSample(x, y, 0)
    val iio = PngPixelHash.dhash(px, w, h)
    assert(ham(iio.longValue(), ours.longValue()) <= 2,
      s"progressive gray JPEG differential at Hamming ${ham(iio, ours)}")
  }

  test("ImageIO differential on our gray fixtures: an independent decoder sees the same image") {
    (0L until 25L).foreach { id =>
      val bytes = JpegFixture.build(id, "base")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO must decode fixture $id")
      assert(img.getWidth == 16 && img.getHeight == 16)
      val px = new Array[Int](16 * 16)
      val raster = img.getRaster
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) { px(y * 16 + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      val iio = PngPixelHash.dhash(px, 16, 16)
      val ours = baseHash(id)
      // libjpeg's IDCT and ours are both islow-shaped but may differ in
      // the last gray level on a few samples — allow 2 gradient bits
      assert(ham(iio, ours) <= 2,
        s"id $id: ImageIO dHash vs ours at Hamming ${ham(iio, ours)}")
    }
  }

  test("ImageIO-ENCODED color 4:2:0 JPEG: the multi-component path decodes the Y plane") {
    // a smooth RGB field (quantization-stable like the fixtures)
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + (x * 3) % 180
      val g = 200 - (y * 3) % 160
      val b = 60 + ((x + y) * 2) % 150
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "ImageIO must emit JPEG")
    val bytes = bos.toByteArray
    val ours = JpegPixelHash.hash(bytes)
    assert(ours != null, "ImageIO's baseline color JPEG must decode")
    // ground truth: ImageIO's own decode -> integer luma -> the same dhash
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val px = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      px(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
    }
    val iio = PngPixelHash.dhash(px, w, h)
    // our Y plane skips the YCbCr->RGB->luma round trip ImageIO's path
    // takes (clamping + rounding both ways) — allow a few gradient bits
    assert(ham(iio.longValue(), ours.longValue()) <= 4,
      s"color JPEG: luma-dHash differential at Hamming ${ham(iio, ours)}")
  }

  test("ImageIO-ENCODED grayscale JPEG decodes and matches its own decode") {
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, 30 + (x * 5 + y * 3) % 200)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = JpegPixelHash.hash(bytes)
    assert(ours != null, "ImageIO's baseline gray JPEG must decode")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val px = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) px(y * w + x) = back.getRaster.getSample(x, y, 0)
    val iio = PngPixelHash.dhash(px, w, h)
    assert(ham(iio.longValue(), ours.longValue()) <= 2,
      s"gray JPEG differential at Hamming ${ham(iio, ours)}")
  }

  test("EXIF orientation normalization: the rotation-via-metadata re-encode lands; unnormalized it would miss") {
    (0L until 8L).foreach { id =>
      val bytes = JpegFixture.build(id, "exif")
      val normalized = JpegPixelHash.hash(bytes)
      assert(normalized != null, s"exif fixture $id must decode")
      val d = ham(normalized, baseHash(id))
      assert(d <= 4, s"id $id: orientation-normalized twin at Hamming $d > 4")
      // strip the orientation claim (patch the APP1 value to 1): the RAW
      // stored image is physically rotated and must sit far from the base
      // — this is exactly the duplicate class normalization buys
      val raw = bytes.clone()
      assert((raw(30) & 0xff) == 0 && (raw(31) & 0xff) == 6, "fixture layout moved")
      raw(31) = 1
      val unnormalized = JpegPixelHash.hash(raw)
      assert(unnormalized != null)
      assert(ham(unnormalized, baseHash(id)) > 4,
        s"id $id: the physically-rotated image must NOT pair without normalization")
      // every orientation value (incl. invalid) decodes cleanly
      (0 to 9).foreach { o => raw(31) = o.toByte; JpegPixelHash.hash(raw) }
    }
  }

  test("jpegPairs over pixelJpegCorpus: exactly the planted twins, framing pairs at 0") {
    import spark.implicits._
    val docs = (0L until 120L).toDF("doc_id")
    val corpus = graft.operators.Multimodal.pixelJpegCorpus(docs, "doc_id")
    val pairs = graft.operators.Multimodal.jpegPairs(corpus, maxHamming = 4)
      .select("media_id_1", "media_id_2", "hamming")
      .as[(Long, Long, Int)].collect()
    val expected = (0L until 25L).map(id => (id, id + 100000L)).toSet ++
      (0L until 8L).flatMap(id =>
        Seq((id, id + 200000L), (id + 100000L, id + 200000L))).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == expected,
      "the pair set must be exactly the planted twins")
    pairs.filter(p => p._1 < 13L && p._2 < 200000L).foreach { p =>
      assert(p._3 == 0, s"framing twin ${p._1} must pair at Hamming 0, got ${p._3}")
    }
    // the cluster surface: twins collapse onto their base, corrupt rows
    // are singletons, every input row is present
    val cl = graft.operators.Multimodal.jpegClusters(corpus, maxHamming = 4)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cl.size == 120 + 25 + 8)
    (0L until 25L).foreach { id =>
      assert(cl(id) == ((id, true)))
      assert(cl(id + 100000L) == ((id, false)), s"twin of $id must drop")
    }
    (0L until 8L).foreach { id =>
      assert(cl(id + 200000L) == ((id, false)), s"exif twin of $id must drop")
    }
    (25L until 120L).foreach { id => assert(cl(id) == ((id, true))) }
  }
}
