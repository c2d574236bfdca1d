package graft

import graft.operators.Fuzzy

/** Edit-distance join vs a Scala brute force — completeness of the
  * deletion-neighborhood blocking is the whole game.
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(ls: Seq[String], rs: Seq[String], d: Int): Set[(String, String, Long)] =
    Fuzzy.editDistanceJoin(
      ls.toDF("s").withColumn("id", org.apache.spark.sql.functions.col("s")),
      rs.toDF("s").withColumn("id", org.apache.spark.sql.functions.col("s")),
      "id", "s", "id", "s", maxDist = d)
      .as[(String, String, Long)].collect().toSet

  private def brute(ls: Seq[String], rs: Seq[String], d: Int): Set[(String, String, Long)] =
    (for (a <- ls; b <- rs; dist = lev(a, b) if dist <= d)
      yield (a, b, dist.toLong)).toSet

  test("classic pairs respect the threshold") {
    assert(run(Seq("kitten"), Seq("sitting"), 1).isEmpty)
    assert(run(Seq("kitten"), Seq("sitting"), 3) ==
      Set(("kitten", "sitting", 3L)))
    assert(run(Seq("wallet_123"), Seq("wallet_12", "wallet_123", "wallet_124", "w"), 1) ==
      Set(("wallet_123", "wallet_12", 1L), ("wallet_123", "wallet_123", 0L),
        ("wallet_123", "wallet_124", 1L)))
  }

  test("matches the brute force, short-string sidecar included") {
    // short strings ("a", "ab") can share ZERO bigrams or segments with
    // their matches — deletion variants must still find them (down to the
    // empty-string variant)
    val pool = Seq("a", "b", "ab", "ba", "abc", "abd", "bbc", "abcd", "abed",
      "hello", "hallo", "hellos", "world", "wordl", "wold", "xyzzy")
    (0 to 2).foreach { d =>
      assert(run(pool, pool, d) == brute(pool, pool, d), s"mismatch at d=$d")
    }
  }

  test("dense numeric-neighbor labels at d=1 match the brute force") {
    val labels = (0 until 120).map(i => s"u$i")
    val corrupted = labels.filter(_.length > 2).map(s => s.take(1) + s.drop(2))
    assert(run(corrupted, labels, 1) == brute(corrupted, labels, 1))
  }

  test("null strings never match; empty inputs are total") {
    val l = Seq((1L, "abc"), (2L, null)).toDF("id", "s")
    val r = Seq((10L, "abd")).toDF("id", "s")
    val out = Fuzzy.editDistanceJoin(l, r, "id", "s", "id", "s", 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 10L, 1L)))
    assert(Fuzzy.editDistanceJoin(
      Seq.empty[(Long, String)].toDF("id", "s"), r, "id", "s", "id", "s", 1).count() == 0)
  }
}
