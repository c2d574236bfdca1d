package graft.functions.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The video poster-frame family: container round trip, remux and
  * lossless-re-encode twins at Hamming EXACTLY 0, corrupt-container
  * totality (torn, garbage, audio-only), equality with the bare JPEG
  * hash of the poster frame (the container walk adds nothing to the
  * fingerprint), a byte-mutation fuzz, and the corpus operators'
  * planted-pair surface.
  */
class AviSpec extends SparkSpec {

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def baseHash(id: Long): Long = {
    val h = AviFrameHash.hash(AviFixture.build(id, "base"))
    assert(h != null, s"base clip $id must decode")
    h.longValue()
  }

  test("remux and lossless-re-encode twins hash IDENTICALLY to their base clip") {
    (0L until 25L).foreach { id =>
      val b = baseHash(id)
      Seq("remux", "reenc").foreach { m =>
        val t = AviFrameHash.hash(AviFixture.build(id, m))
        assert(t != null, s"$m twin $id must decode")
        assert(ham(t.longValue(), b) == 0,
          s"id $id: $m must hash at Hamming exactly 0, got ${ham(t.longValue(), b)}")
      }
    }
  }

  test("the poster-frame hash equals the bare JPEG hash of frame 0") {
    (0L until 25L).foreach { id =>
      val direct = JpegPixelHash.hash(JpegFixture.build(id, "base"))
      assert(direct != null && baseHash(id) == direct.longValue(),
        s"id $id: the container walk must add nothing to the fingerprint")
    }
  }

  test("torn / garbage / audio-only containers decode to NULL, never throw") {
    (25L until 60L).foreach { id =>
      Seq("truncated", "garbage", "noframes").foreach { m =>
        assert(AviFrameHash.hash(AviFixture.build(id, m)) == null,
          s"$m clip $id must hash NULL")
      }
    }
    assert(AviFrameHash.hash(null) == null)
    assert(AviFrameHash.hash(Array.emptyByteArray) == null)
  }

  test("byte-mutation fuzz: flipped/truncated containers never throw") {
    (0L until 40L).foreach { id =>
      val base = AviFixture.build(id, "base")
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 25).foreach { k =>
        val h = md.digest(s"$id|az$k".getBytes("UTF-8"))
        val off = (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % base.length + base.length) % base.length
        val mut = base.clone()
        mut(off) = (mut(off) ^ h(2)).toByte
        AviFrameHash.hash(mut) // null or long, never throws
        val cut = ((h(3) & 0xff) << 8 | (h(4) & 0xff)) % base.length
        AviFrameHash.hash(java.util.Arrays.copyOf(base, cut))
      }
    }
  }

  test("corpus operators: planted pair surface and cluster decision on the documents slice") {
    import spark.implicits._
    val docs = (0L until 80L).toDF("doc_id")
    val corpus = graft.operators.Multimodal.mjpegAviCorpus(docs, "doc_id")
    val pairs = graft.operators.Multimodal.videoPairs(corpus, maxHamming = 2)
      .as[(Long, Long, Int)].collect().toSet
    val want: Set[(Long, Long, Int)] =
      (0L until 25L).map(id => (id, id + 100000L, 0)).toSet
    assert(pairs == want,
      s"unexpected pair surface: ${pairs.diff(want)} / missing ${want.diff(pairs)}")
    val clusters = graft.operators.Multimodal.videoClusters(corpus, maxHamming = 2)
      .as[(Long, Long, Boolean)].collect()
    val byId = clusters.map(c => c._1 -> ((c._2, c._3))).toMap
    (0L until 25L).foreach { id =>
      assert(byId(id) == ((id, true)) && byId(id + 100000L) == ((id, false)))
    }
    (25L until 80L).filter(id => id % 13 == 0 || id % 17 == 0 || id % 19 == 0)
      .foreach(id => assert(byId(id) == ((id, true)), s"undecodable $id must stay a singleton"))
  }
}
