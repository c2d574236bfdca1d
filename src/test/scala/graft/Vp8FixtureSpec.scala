package graft.functions.expressions

import graft.SparkSpec

/** The lossy-VP8 fixture encoder against the (libwebp-pinned) decoder:
  * integer-exact round trip of the encoder's mirrored reconstruction,
  * twin Hamming bounds for the CDN re-encode classes, and byte overlap
  * sanity (the duplicate class byte hashing would miss).
  */
class Vp8FixtureSpec extends SparkSpec {

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("the decoder reproduces the encoder's mirrored reconstruction EXACTLY (integer round trip)") {
    (0L until 30L).foreach { id =>
      Seq(8, 25, 50).foreach { qi =>
        val (bytes, recon) = Vp8Fixture.buildWithRecon(id, qi)
        val f = WebpPixelHash.decodeVp8(bytes)
        assert(f != null, s"id $id qi $qi must decode")
        assert(f.w == 16 && f.h == 16)
        var i = 0
        while (i < 256) {
          val got = f.y((i / 16) * f.yStride + (i % 16))
          assert(got == recon(i),
            s"id $id qi $qi luma($i): got $got want ${recon(i)}")
          i += 1
        }
        // chroma: all-zero residual over DC prediction from borders
        assert((0 until 64).forall(i2 =>
          f.u((i2 / 8) * f.uvStride + (i2 % 8)) == 128 &&
            f.v((i2 / 8) * f.uvStride + (i2 % 8)) == 128))
      }
    }
  }

  test("lossy twins: VP8L->VP8 re-encode and VP8->VP8 quality ladder land inside the near-dup threshold") {
    (0L until 25L).foreach { id =>
      val base = WebpPixelHash.hash(WebpFixture.build(id, "base")).longValue()
      val q8 = WebpPixelHash.hash(Vp8Fixture.build(id, 8)).longValue()
      val q25 = WebpPixelHash.hash(Vp8Fixture.build(id, 25)).longValue()
      assert(ham(base, q8) <= 4, s"id $id: lossless->q8 Hamming ${ham(base, q8)}")
      assert(ham(q8, q25) <= 4, s"id $id: q8->q25 Hamming ${ham(q8, q25)}")
      assert(ham(base, q25) <= 6, s"id $id: lossless->q25 Hamming ${ham(base, q25)}")
    }
  }

  test("re-encode shares almost no bytes with the lossless stream (byte identity provably misses the class)") {
    (0L until 10L).foreach { id =>
      val a = WebpFixture.build(id, "base")
      val b = Vp8Fixture.build(id, 8)
      val grams = (bs: Array[Byte]) => bs.sliding(8).map(_.toSeq).toSet
      val inter = grams(a).intersect(grams(b)).size
      assert(inter <= 4, s"id $id: $inter shared 8-grams")
    }
  }

  test("fuzz: mutated and torn fixture streams never throw") {
    val rnd = new scala.util.Random(7)
    val base = Vp8Fixture.build(3L, 8)
    (0 until 300).foreach { _ =>
      val m = base.clone()
      (0 until 1 + rnd.nextInt(3)).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      WebpPixelHash.hash(m)
    }
    (1 until base.length by 7).foreach { n =>
      WebpPixelHash.hash(java.util.Arrays.copyOf(base, n))
    }
  }
}
