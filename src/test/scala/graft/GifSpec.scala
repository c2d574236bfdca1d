package graft.functions.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The GIF pixel-level near-dup family: encoder/decoder round trip, all
  * three re-encode twin invariants at Hamming EXACTLY 0, corrupt-input
  * totality, ImageIO differentials in BOTH directions (ImageIO decodes
  * our streams; our decoder hashes ImageIO's own encodes), a
  * byte-mutation fuzz, and the corpus operators' planted-pair surface.
  */
class GifSpec extends SparkSpec {

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def baseHash(id: Long): Long = {
    val h = GifPixelHash.hash(GifFixture.build(id, "base"))
    assert(h != null, s"base fixture $id must decode")
    h.longValue()
  }

  test("reblock / palperm / interlace re-encode twins all hash IDENTICALLY to their base") {
    (0L until 25L).foreach { id =>
      val b = baseHash(id)
      Seq("reblock", "palperm", "interlace").foreach { m =>
        val t = GifPixelHash.hash(GifFixture.build(id, m))
        assert(t != null, s"$m twin $id must decode")
        assert(ham(t.longValue(), b) == 0,
          s"id $id: $m re-encode must hash at Hamming exactly 0, got ${ham(t.longValue(), b)}")
      }
    }
  }

  test("non-twin fingerprints stay far outside the pair threshold") {
    val hs = (0L until 60L).map(baseHash)
    val nonTwin = for { i <- hs.indices; j <- hs.indices if i < j } yield ham(hs(i), hs(j))
    assert(nonTwin.min > 2 + 8,
      s"closest non-twin pair at Hamming ${nonTwin.min} — too close to the threshold")
  }

  test("truncated / garbage / no-color-table variants decode to NULL, never throw") {
    (25L until 60L).foreach { id =>
      Seq("truncated", "garbage", "noct").foreach { m =>
        assert(GifPixelHash.hash(GifFixture.build(id, m)) == null,
          s"$m fixture $id must hash NULL")
      }
    }
    assert(GifPixelHash.hash(null) == null)
    assert(GifPixelHash.hash(Array.emptyByteArray) == null)
  }

  test("ImageIO differential: an independent decoder sees the same raster in our streams") {
    (0L until 25L).foreach { id =>
      Seq("base", "reblock", "palperm", "interlace").foreach { m =>
        val bytes = GifFixture.build(id, m)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        assert(img != null, s"ImageIO must decode $m fixture $id")
        assert(img.getWidth == 16 && img.getHeight == 16)
        val idx = GifFixture.indices(id)
        (0 until 16).foreach { y =>
          (0 until 16).foreach { x =>
            val rgb = img.getRGB(x, y)
            val want = idx(y * 16 + x) * 255 / 63
            assert((rgb & 0xff) == want && ((rgb >> 8) & 0xff) == want,
              s"$m/$id pixel ($x,$y): ImageIO sees ${rgb & 0xff}, plane says $want")
          }
        }
      }
    }
  }

  test("reverse differential: our decoder hashes ImageIO's own GIF encodes correctly") {
    (0L until 10L).foreach { id =>
      val idx = GifFixture.indices(id)
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach { y =>
        (0 until 16).foreach { x =>
          val v = idx(y * 16 + x) * 255 / 63
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", out), "JDK must have a GIF writer")
      val h = GifPixelHash.hash(out.toByteArray)
      assert(h != null, s"our decoder must decode ImageIO's encode of $id")
      assert(ham(h.longValue(), baseHash(id)) == 0,
        s"id $id: an INDEPENDENT encoder's stream must hash identically to ours")
    }
  }

  test("byte-mutation fuzz: flipped/truncated streams never throw") {
    (0L until 40L).foreach { id =>
      val base = GifFixture.build(id, "base")
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 25).foreach { k =>
        val h = md.digest(s"$id|gz$k".getBytes("UTF-8"))
        val off = (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % base.length + base.length) % base.length
        val mut = base.clone()
        mut(off) = (mut(off) ^ h(2)).toByte
        GifPixelHash.hash(mut) // must not throw
        val cut = ((h(3) & 0xff) << 8 | (h(4) & 0xff)) % base.length
        GifPixelHash.hash(java.util.Arrays.copyOf(base, cut))
      }
    }
  }

  test("corpus operators: planted pair surface and cluster decision on the documents slice") {
    import spark.implicits._
    val docs = (0L until 80L).toDF("doc_id")
    val corpus = graft.operators.Multimodal.pixelGifCorpus(docs, "doc_id")
    val pairs = graft.operators.Multimodal.gifPairs(corpus, maxHamming = 2)
      .as[(Long, Long, Int)].collect().toSet
    val want: Set[(Long, Long, Int)] =
      (0L until 25L).map(id => (id, id + 100000L, 0)).toSet
    assert(pairs == want,
      s"unexpected pair surface: ${pairs.diff(want)} / missing ${want.diff(pairs)}")
    val clusters = graft.operators.Multimodal.gifClusters(corpus, maxHamming = 2)
      .as[(Long, Long, Boolean)].collect()
    val byId = clusters.map(c => c._1 -> ((c._2, c._3))).toMap
    (0L until 25L).foreach { id =>
      assert(byId(id) == ((id, true)) && byId(id + 100000L) == ((id, false)))
    }
    (25L until 80L).filter(id => id % 13 == 0 || id % 17 == 0 || id % 19 == 0)
      .foreach(id => assert(byId(id) == ((id, true)), s"undecodable $id must stay a singleton"))
  }
}
