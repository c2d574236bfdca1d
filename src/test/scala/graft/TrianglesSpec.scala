package graft

import graft.operators.Triangles

/** Triangle counting vs hand-countable graphs and a Scala brute force. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Triangles.perNodeTriangles(edges.toDF("u", "v"))
      .as[(Long, Long, Long)].collect().map { case (n, d, t) => n -> (d, t) }.toMap

  test("K4: every node has degree 3 and sits in 3 triangles") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val out = run(k4)
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out.values.forall(_ == (3L, 3L)))
  }

  test("triangle with a pendant edge; duplicates, reversals, self-loops collapse") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 3L), (3L, 4L), (3L, 4L))
    val out = run(messy)
    assert(out(1L) == (2L, 1L) && out(2L) == (2L, 1L))
    assert(out(3L) == (3L, 1L)) // degree counts the pendant, triangles don't
    assert(out(4L) == (1L, 0L))
  }

  test("a path has no triangles") {
    val out = run((0L until 9L).map(i => (i, i + 1)))
    assert(out.values.forall(_._2 == 0L))
    assert(out(0L)._1 == 1L && out(5L)._1 == 2L)
  }

  test("matches a Scala brute force on a deterministic pseudo-random graph") {
    val edges = (0 until 400).map { i =>
      val a = (i * 131) % 40; val b = (i * i * 37 + i) % 40
      (a.toLong, b.toLong)
    }
    val canon = edges.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2))
    val expectedTri = nodes.map { n =>
      n -> canon.toSeq.count { case (a, b) =>
        a != n && b != n && canon(math.min(a, n) -> math.max(a, n)) &&
          canon(math.min(b, n) -> math.max(b, n))
      }.toLong
    }.toMap
    val expectedDeg = nodes.map(n => n -> canon.count(e => e._1 == n || e._2 == n).toLong).toMap
    val out = run(edges)
    assert(out.keySet == nodes)
    nodes.foreach { n =>
      assert(out(n) == (expectedDeg(n), expectedTri(n)),
        s"node $n: got ${out(n)}, want (${expectedDeg(n)}, ${expectedTri(n)})")
    }
  }

  test("node ids past the packing cap fail loudly") {
    val ex = intercept[Exception] { run(Seq((1L, 1L << 21))) }
    assert(ex.getMessage.contains("densify") || ex.getCause != null)
  }
}
