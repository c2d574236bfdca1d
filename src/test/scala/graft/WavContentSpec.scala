package graft.functions.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audio content near-dup family: generator/decoder round trip, all
  * four re-encode twin invariants at Hamming EXACTLY 0, corrupt-input
  * totality, a javax.sound.sampled differential (an independent decoder
  * sees the same samples), a byte-mutation fuzz (never throw), and the
  * corpus operators' planted-pair surface.
  */
class WavContentSpec extends SparkSpec {

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def baseHash(id: Long): Long = {
    val h = WavContentHash.hash(WavFixture.build(id, "base"))
    assert(h != null, s"base fixture $id must decode")
    h.longValue()
  }

  test("gain / pad / quant8 / stereo re-encode twins all hash IDENTICALLY to their base") {
    (0L until 25L).foreach { id =>
      val b = baseHash(id)
      Seq("gain", "pad", "quant8", "stereo").foreach { m =>
        val t = WavContentHash.hash(WavFixture.build(id, m))
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

  test("truncated / garbage / float32 variants decode to NULL, never throw") {
    (25L until 60L).foreach { id =>
      Seq("truncated", "garbage", "float32").foreach { m =>
        assert(WavContentHash.hash(WavFixture.build(id, m)) == null,
          s"$m fixture $id must hash NULL")
      }
    }
    assert(WavContentHash.hash(null) == null)
    assert(WavContentHash.hash(Array.emptyByteArray) == null)
    // sub-minimum content: fewer than 65 post-trim samples
    assert(WavContentHash.hash(WavFixture.build(1L, "base").take(44 + 64)) == null)
  }

  test("javax.sound.sampled differential: an independent decoder sees the same samples") {
    import javax.sound.sampled.AudioSystem
    Seq[(String, Long)](("base", 0L), ("base", 7L), ("gain", 3L),
      ("pad", 11L), ("quant8", 19L), ("stereo", 5L)).foreach { case (mode, id) =>
      val bytes = WavFixture.build(id, mode)
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val raw = in.readAllBytes()
      // decode through the INDEPENDENT codec, then recompute the
      // fingerprint pipeline in plain test Scala
      val frames = raw.length / fmt.getFrameSize
      val mono = new Array[Int](frames)
      var i = 0
      while (i < frames) {
        def sampleAt(ch: Int): Int =
          if (fmt.getSampleSizeInBits == 16) {
            val o = i * fmt.getFrameSize + ch * 2
            ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort.toInt
          } else ((raw(i * fmt.getFrameSize + ch) & 0xff) - 128) << 8
        mono(i) =
          if (fmt.getChannels == 2) (sampleAt(0) + sampleAt(1)) >> 1 else sampleAt(0)
        i += 1
      }
      var lo = 0
      while (lo < frames && math.abs(mono(lo)) <= WavContentHash.SilenceFloor) lo += 1
      var hi = frames - 1
      while (hi >= lo && math.abs(mono(hi)) <= WavContentHash.SilenceFloor) hi -= 1
      val n0 = hi - lo + 1
      val n = n0 - n0 % WavContentHash.Windows
      val ws = n / WavContentHash.Windows
      val sums = (0 until WavContentHash.Windows).map { w =>
        (0 until ws).map(j => math.abs(mono(lo + w * ws + j).toLong)).sum
      }
      var want = 0L
      (0 until 64).foreach(k => if (sums(k + 1) > sums(k)) want |= (1L << k))
      val got = WavContentHash.hash(bytes)
      assert(got != null && got.longValue() == want,
        s"$mode/$id: expression hash must equal the javax.sound-differential recompute")
    }
  }

  test("byte-mutation fuzz: flipped/truncated streams never throw") {
    (0L until 40L).foreach { id =>
      val base = WavFixture.build(id, "base")
      // deterministic mutations: flip one byte at md5-derived offsets,
      // truncate at md5-derived lengths
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 25).foreach { k =>
        val h = md.digest(s"$id|fz$k".getBytes("UTF-8"))
        val off = (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % base.length + base.length) % base.length
        val mut = base.clone()
        mut(off) = (mut(off) ^ h(2)).toByte
        WavContentHash.hash(mut) // must not throw; value is unconstrained
        val cut = ((h(3) & 0xff) << 8 | (h(4) & 0xff)) % base.length
        WavContentHash.hash(java.util.Arrays.copyOf(base, cut))
      }
    }
  }

  test("corpus operators: planted pair surface and cluster decision on the documents slice") {
    import spark.implicits._
    val docs = (0L until 80L).toDF("doc_id")
    val corpus = graft.operators.Multimodal.pcmWavCorpus(docs, "doc_id")
    val pairs = graft.operators.Multimodal.audioPairs(corpus, maxHamming = 2)
      .as[(Long, Long, Int)].collect().toSet
    val want: Set[(Long, Long, Int)] =
      (0L until 25L).map(id => (id, id + 100000L, 0)).toSet ++
        (0L until 8L).map(id => (id, id + 200000L, 0)) ++
        (0L until 8L).map(id => (id + 100000L, id + 200000L, 0))
    assert(pairs == want, s"unexpected pair surface: ${pairs.diff(want)} / missing ${want.diff(pairs)}")
    val clusters = graft.operators.Multimodal.audioClusters(corpus, maxHamming = 2)
      .as[(Long, Long, Boolean)].collect()
    val byId = clusters.map(c => c._1 -> ((c._2, c._3))).toMap
    (0L until 25L).foreach { id =>
      assert(byId(id) == ((id, true)), s"base $id must keep itself")
      assert(byId(id + 100000L) == ((id, false)), s"twin of $id must collapse onto it")
    }
    (0L until 8L).foreach(id => assert(byId(id + 200000L) == ((id, false))))
    // corrupt rows (>=25, %13/%17/%19) are singletons that keep themselves
    (25L until 80L).filter(id => id % 13 == 0 || id % 17 == 0 || id % 19 == 0)
      .foreach(id => assert(byId(id) == ((id, true)), s"undecodable $id must stay a singleton"))
  }
}
