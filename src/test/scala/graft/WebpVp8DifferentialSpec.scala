package graft.functions.expressions

import graft.SparkSpec

/** BYTE-EXACT differential for the native lossy-VP8 decoder: vendored
  * keyframe streams produced by the system libwebp are decoded by
  * [[Vp8Decode]] and every Y/U/V sample compared against libwebp's OWN
  * YUV420 reconstruction (`WebPDecodeYUV` — the normative decoder
  * output, before any upsampler/colorspace choice). Two qualities per
  * image exercise both DC-heavy and B_PRED-heavy mode mixes plus the
  * in-loop deblocking filter at different levels.
  */
class WebpVp8DifferentialSpec extends SparkSpec {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webp/$name")
    assert(in != null, s"missing vendored fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val manifest: Seq[(String, Int, Int, Int)] =
    new String(res("manifest.txt"), "UTF-8").split("\n").toSeq
      .map(_.trim).filter(_.nonEmpty).map(_.split(" "))
      .collect { case Array(n, w, h, q, "vp8") => (n, w.toInt, h.toInt, q.toInt) }

  private def vp8Payload(container: Array[Byte]): (Int, Int) = {
    var pos = 12
    while (pos + 8 <= container.length) {
      val tag = new String(container.slice(pos, pos + 4), "US-ASCII")
      val sz = (container(pos + 4) & 0xff) | ((container(pos + 5) & 0xff) << 8) |
        ((container(pos + 6) & 0xff) << 16) | ((container(pos + 7) & 0xff) << 24)
      if (tag == "VP8 ") return (pos + 8, pos + 8 + sz)
      pos += 8 + sz + (sz & 1)
    }
    fail("no VP8 chunk")
  }

  test("every vendored lossy stream decodes to EXACTLY libwebp's own YUV reconstruction") {
    assert(manifest.size >= 30)
    var failures = List.empty[String]
    manifest.foreach { case (name, w, h, q) =>
      val webp = res(s"$name.q$q.webp")
      val (s, e) = vp8Payload(webp)
      val f = Vp8Decode.decode(webp, s, e)
      if (f == null) failures ::= s"$name q$q: decode returned null"
      else {
        val want = res(s"$name.q$q.yuv")
        val cw = (w + 1) / 2; val ch = (h + 1) / 2
        assert(want.length == w * h + 2 * cw * ch, s"$name q$q fixture size")
        var bad = 0; var firstBad = ""
        for (y <- 0 until h; x <- 0 until w) {
          val got = f.y(y * f.yStride + x); val exp = want(y * w + x) & 0xff
          if (got != exp) { bad += 1; if (bad == 1) firstBad = s"Y($x,$y) got $got want $exp" }
        }
        for (y <- 0 until ch; x <- 0 until cw) {
          val gu = f.u(y * f.uvStride + x); val eu = want(w * h + y * cw + x) & 0xff
          if (gu != eu) { bad += 1; if (firstBad.isEmpty) firstBad = s"U($x,$y) got $gu want $eu" }
          val gv = f.v(y * f.uvStride + x); val ev = want(w * h + cw * ch + y * cw + x) & 0xff
          if (gv != ev) { bad += 1; if (firstBad.isEmpty) firstBad = s"V($x,$y) got $gv want $ev" }
        }
        if (bad > 0) failures ::= s"$name q$q: $bad/${w * h + 2 * cw * ch} samples differ ($firstBad)"
      }
    }
    assert(failures.isEmpty, failures.reverse.mkString("\n"))
  }

  test("fuzz: byte mutations of real lossy streams never throw") {
    val (name, _, _, q) = manifest.head
    val webp = res(s"$name.q$q.webp")
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val m = webp.clone()
      val n = 1 + rnd.nextInt(4)
      (0 until n).foreach { _ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte }
      val (s, e) = try vp8Payload(m) catch { case _: Throwable => (12, m.length) }
      Vp8Decode.decode(m, s, math.min(e, m.length)) // must not throw
    }
    (0 until 100).foreach { i =>
      val m = java.util.Arrays.copyOf(webp, math.max(1, i * webp.length / 100))
      Vp8Decode.decode(m, 20, m.length) // torn at arbitrary points
    }
  }
}
