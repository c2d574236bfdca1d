package graft.functions.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The WebP (VP8L) pixel-level near-dup family: pixel-EXACT round trips
  * of every encoder variant against the pre-encode ground-truth raster
  * (the strongest differential available — no independent WebP codec
  * ships in the JVM), all four re-encode twin invariants at Hamming
  * EXACTLY 0, bundled-palette and meta-prefix-group coverage,
  * corrupt/lossy totality, byte-mutation fuzz, and the corpus operators'
  * planted-pair surface.
  */
class WebpSpec extends SparkSpec {

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def baseHash(id: Long): Long = {
    val h = WebpPixelHash.hash(WebpFixture.build(id, "base"))
    assert(h != null, s"base fixture $id must decode")
    h.longValue()
  }

  test("every variant decodes PIXEL-EXACTLY back to the source raster (both directions of the codec)") {
    (0L until 25L).foreach { id =>
      val want = WebpFixture.argbPixels(id)
      Seq("base", "subg", "pred", "pal", "cache", "meta").foreach { m =>
        val got = WebpPixelHash.decodeArgb(WebpFixture.build(id, m))
        assert(got != null, s"$m fixture $id must decode")
        assert(got._2 == 16 && got._3 == 16, s"$m fixture $id dims")
        assert(java.util.Arrays.equals(got._1, want),
          s"$m fixture $id must reconstruct the exact ARGB raster")
      }
      val want4 = WebpFixture.argbPixels4(id)
      Seq("pal4", "pal4lit").foreach { m =>
        val got = WebpPixelHash.decodeArgb(WebpFixture.build(id, m))
        assert(got != null && java.util.Arrays.equals(got._1, want4),
          s"$m fixture $id must reconstruct the exact quantized raster")
      }
    }
  }

  test("subg / pred / pal / cache / meta re-encode twins all hash IDENTICALLY to their base") {
    (0L until 25L).foreach { id =>
      val b = baseHash(id)
      Seq("subg", "pred", "pal", "cache", "meta").foreach { m =>
        val t = WebpPixelHash.hash(WebpFixture.build(id, m))
        assert(t != null, s"$m twin $id must decode")
        assert(ham(t.longValue(), b) == 0,
          s"id $id: $m re-encode must hash at Hamming exactly 0, got ${ham(t.longValue(), b)}")
      }
      // the bundled-palette pair is its own twin class (quantized raster)
      val p4 = WebpPixelHash.hash(WebpFixture.build(id, "pal4"))
      val p4l = WebpPixelHash.hash(WebpFixture.build(id, "pal4lit"))
      assert(p4 != null && p4l != null && ham(p4.longValue(), p4l.longValue()) == 0,
        s"id $id: bundled palette vs literal twin must hash at Hamming 0")
    }
  }

  test("re-encodes share almost no bytes with the base (the duplicate class byte hashing misses)") {
    (0L until 5L).foreach { id =>
      val base = WebpFixture.build(id, "base")
      val total = base.toSeq.sliding(16).toSet.size
      Seq("subg", "pal", "cache").foreach { m =>
        val re = WebpFixture.build(id, m)
        val shared = base.toSeq.sliding(16).toSet
          .intersect(re.toSeq.sliding(16).toSet).size
        // the transform reshapes the literal stream; a small shared tail
        // (shared green code definitions) is expected, wholesale byte
        // overlap is not
        assert(shared * 10 <= total,
          s"id $id $m: expected <10% shared 16-grams vs base, got $shared/$total")
      }
    }
  }

  test("non-twin fingerprints stay far outside the pair threshold") {
    val hs = (0L until 60L).map(baseHash)
    val nonTwin = for { i <- hs.indices; j <- hs.indices if i < j } yield ham(hs(i), hs(j))
    assert(nonTwin.min > 2 + 8,
      s"closest non-twin pair at Hamming ${nonTwin.min} — too close to the threshold")
  }

  test("truncated / garbage / lossy variants decode to NULL, never throw") {
    (25L until 60L).foreach { id =>
      Seq("truncated", "garbage", "lossy").foreach { m =>
        assert(WebpPixelHash.hash(WebpFixture.build(id, m)) == null,
          s"$m fixture $id must hash NULL")
      }
    }
    assert(WebpPixelHash.hash(null) == null)
    assert(WebpPixelHash.hash(Array.emptyByteArray) == null)
  }

  test("byte-mutation fuzz over real VP8L streams never throws") {
    val rnd = new scala.util.Random(20260818L)
    val bases = Seq(
      WebpFixture.build(1L, "base"), WebpFixture.build(2L, "subg"),
      WebpFixture.build(3L, "pred"), WebpFixture.build(4L, "pal"),
      WebpFixture.build(5L, "cache"), WebpFixture.build(6L, "meta"),
      WebpFixture.build(7L, "pal4"))
    var i = 0
    while (i < 3000) {
      val b = bases(rnd.nextInt(bases.length)).clone()
      rnd.nextInt(4) match {
        case 0 => // truncate anywhere
          WebpPixelHash.hash(java.util.Arrays.copyOfRange(b, 0, rnd.nextInt(b.length + 1)))
        case 1 => // flip a byte
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          WebpPixelHash.hash(b)
        case 2 => // splice two streams
          val other = bases(rnd.nextInt(bases.length))
          val cut = rnd.nextInt(math.min(b.length, other.length))
          WebpPixelHash.hash(b.take(cut) ++ other.drop(cut))
        case _ => // flip a bit inside the VP8L payload (past the header)
          val at = 20 + rnd.nextInt(b.length - 20)
          b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
          WebpPixelHash.hash(b)
      }
      i += 1
    }
  }

  test("corpus operators: planted pairs surface, corrupt rows stay singletons") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val corpus = graft.operators.Multimodal.pixelWebpCorpus(docs, "doc_id")
    val pairs = graft.operators.Multimodal.webpPairs(corpus, maxHamming = 2)
      .select("media_id_1", "media_id_2", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val want = (0L until 25L).map(id => (id, id + 100000L, 0)).toSet
    assert(pairs == want, s"expected exactly the 25 planted twin pairs, got ${pairs.size}")
    val clusters = graft.operators.Multimodal.webpClusters(corpus, maxHamming = 2)
      .as[(Long, Long, Boolean)].collect()
    assert(clusters.length == 65) // 40 base + 25 twins
    clusters.foreach { case (m, comp, keep) =>
      if (m >= 100000L) { assert(comp == m - 100000L && !keep, s"twin $m") }
      else { assert(comp == m && keep, s"base $m") }
    }
  }
}
