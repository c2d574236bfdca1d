package graft.functions.expressions

import graft.SparkSpec

/** The cross-container audio family: FLAC decode is SAMPLE-EXACT against
  * the pre-encode signal (the strongest differential — FLAC is
  * integer-exact by spec), every WAV↔FLAC twin hashes at Hamming
  * EXACTLY 0 through the shared envelope, stereo decorrelations and
  * mixed subframe types round-trip, corrupt rows are total, and the
  * corpus operators surface exactly the planted pairs.
  */
class FlacSpec extends SparkSpec {

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("FLAC decode is sample-exact against the source signal for every variant") {
    (0L until 25L).foreach { id =>
      val src = WavFixture.samples(id)
      Seq("flac", "ms", "ls").foreach { m =>
        val dec = FlacContentHash.decodeMono16(FlacFixture.build(id, m))
        assert(dec != null, s"$m fixture $id must decode")
        assert(java.util.Arrays.equals(dec, src),
          s"$m fixture $id must reconstruct the exact sample run")
      }
    }
  }

  test("WAV <-> FLAC twins hash at Hamming EXACTLY 0 across containers") {
    (0L until 25L).foreach { id =>
      val wav = WavContentHash.hash(WavFixture.build(id, "base"))
      assert(wav != null)
      Seq("flac", "ms", "ls").foreach { m =>
        val fl = FlacContentHash.hash(FlacFixture.build(id, m))
        assert(fl != null, s"$m fixture $id must hash")
        assert(ham(wav.longValue(), fl.longValue()) == 0,
          s"id $id: the $m FLAC encode must hash identically to its WAV original")
      }
    }
  }

  test("the decoders are container-strict: WAV bytes hash NULL through FLAC and vice versa") {
    val wav = WavFixture.build(1L, "base")
    val flac = FlacFixture.build(1L, "flac")
    assert(FlacContentHash.hash(wav) == null)
    assert(WavContentHash.hash(flac) == null)
  }

  test("truncated / garbage decode to NULL, never throw") {
    (25L until 60L).foreach { id =>
      Seq("truncated", "garbage").foreach { m =>
        assert(FlacContentHash.hash(FlacFixture.build(id, m)) == null,
          s"$m fixture $id must hash NULL")
      }
    }
    assert(FlacContentHash.hash(null) == null)
    assert(FlacContentHash.hash(Array.emptyByteArray) == null)
  }

  test("byte-mutation fuzz over real FLAC streams never throws") {
    val rnd = new scala.util.Random(20260819L)
    val bases = Seq(
      FlacFixture.build(1L, "flac"), FlacFixture.build(2L, "ms"),
      FlacFixture.build(3L, "ls"))
    var i = 0
    while (i < 3000) {
      val b = bases(rnd.nextInt(bases.length)).clone()
      rnd.nextInt(4) match {
        case 0 =>
          FlacContentHash.hash(java.util.Arrays.copyOfRange(b, 0, rnd.nextInt(b.length + 1)))
        case 1 =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          FlacContentHash.hash(b)
        case 2 =>
          val other = bases(rnd.nextInt(bases.length))
          val cut = rnd.nextInt(math.min(b.length, other.length))
          FlacContentHash.hash(b.take(cut) ++ other.drop(cut))
        case _ =>
          val at = 42 + rnd.nextInt(b.length - 42) // inside frame data
          b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
          FlacContentHash.hash(b)
      }
      i += 1
    }
  }

  test("corpus operators: exactly the planted WAV<->FLAC pairs; corrupt rows singletons") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val corpus = graft.operators.Multimodal.crossAudioCorpus(docs, "doc_id")
    val pairs = graft.operators.Multimodal.crossAudioPairs(corpus, maxHamming = 2)
      .select("media_id_1", "media_id_2", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == (0L until 25L).map(id => (id, id + 100000L, 0)).toSet,
      s"expected exactly the 25 planted cross-container pairs, got ${pairs.size}")
    val clusters = graft.operators.Multimodal.crossAudioClusters(corpus, maxHamming = 2)
      .as[(Long, Long, Boolean)].collect()
    assert(clusters.length == 65)
    clusters.foreach { case (m, comp, keep) =>
      if (m >= 100000L) assert(comp == m - 100000L && !keep)
      else assert(comp == m && keep)
    }
  }
}
