package graft

import graft.operators.SuffixDedup
import org.apache.spark.sql.functions._

/** Distributed suffix-array exact-substring dedup: planted boilerplate
  * coverage against a brute-force duplicated-k-window reference, doc
  * boundaries (no cross-doc span bleed), within-doc repeats, and the
  * no-duplicates corpus.
  */
class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: position p covered iff some k-window
    * containing it occurs >= 2 times in the corpus.
    */
  private def reference(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val grams = scala.collection.mutable.HashMap.empty[Seq[String], Int]
    toks.foreach { case (_, ts) =>
      ts.sliding(k).filter(_.size == k).foreach(g => grams(g) = grams.getOrElse(g, 0) + 1)
    }
    toks.map { case (id, ts) =>
      val covered = scala.collection.mutable.BitSet.empty
      ts.sliding(k).zipWithIndex.foreach { case (g, q) =>
        if (g.size == k && grams(g) >= 2) (q until q + k).foreach(covered += _)
      }
      id -> ((ts.size.toLong, covered.size.toLong))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long)] =
    SuffixDedup.duplicateSpanCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("cross-document boilerplate coverage matches the brute-force reference exactly") {
    val boiler = "subscribe to our newsletter for daily updates and exclusive offers today"
    val docs = (0L until 20L).map { i =>
      val body = (0 until 30).map(j => s"w${i}x$j").mkString(" ")
      val t = if (i % 3 == 0) s"$body $boiler" else body
      (i, t)
    }
    val k = 6
    assert(run(docs, k) == reference(docs, k))
  }

  test("within-document repetition is found; spans never cross doc boundaries") {
    val rep = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"$rep unique middle tokens here $rep"),
      (2L, "totally different content with no repeats at all okay"),
      // doc 3 ENDS with the prefix of doc 4's START: must not merge
      (3L, "one two three four five six seven"),
      (4L, "five six seven eight nine ten eleven"))
    val k = 4
    assert(run(docs, k) == reference(docs, k))
  }

  test("a corpus with no >=k duplicates reports zero coverage everywhere") {
    val docs = (0L until 10L).map(i =>
      (i, (0 until 25).map(j => s"u${i}q$j").mkString(" ")))
    val got = run(docs, 5)
    assert(got.values.forall(_._2 == 0L))
    assert(got.values.map(_._1).toSet == Set(25L))
  }

  test("offset rewrite: scrambled multi-partition input matches brute force " +
    "(two-phase prefix sums == the old global window)") {
    // varying doc lengths + a shuffled 13-partition layout exercise the
    // per-partition subtotal/base arithmetic; any mis-offset would merge
    // or split spans across doc boundaries and break the coverage map
    val boiler = "common footer text duplicated across many documents here"
    val docs = (0L until 40L).map { i =>
      val body = (0 until (5 + i % 7).toInt).map(j => s"t${i}v$j").mkString(" ")
      (i, if (i % 4 == 0) s"$body $boiler" else body)
    }
    val k = 4
    val scrambled = new scala.util.Random(7).shuffle(docs).toDF("doc_id", "text")
      .repartition(13)
    val got = SuffixDedup.duplicateSpanCoverage(scrambled, "doc_id", "text", k)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == reference(docs, k))
  }

  test("empty corpus (no docs / whitespace-only texts) returns the empty frame") {
    // r16 regression guard: n == 0 must early-return, not feed the
    // partitioner's require(d > 0)
    val empty = Seq.empty[(Long, String)]
    assert(run(empty, 4).isEmpty)
    val blank = Seq((1L, "   "), (2L, ""), (3L, "\t \n"))
    assert(run(blank, 4).isEmpty)
  }

  test("sparse/giant doc ids: sentinel ranks stay dense, results exact") {
    // ids far beyond nTokRanks + nDocs — raw-id sentinel ranks would
    // exceed the round-1 partitioner domain (straggler clamp); dense
    // per-doc indexes keep the same order with in-domain keys
    val boiler = "shared footer line repeated across documents verbatim"
    val docs = Seq(5L, 1000000007L, 9223372036854L, 42L, 777777777777L)
      .zipWithIndex.map { case (id, i) =>
        val body = (0 until 12).map(j => s"d${i}w$j").mkString(" ")
        (id, if (i % 2 == 0) s"$body $boiler" else body)
      }
    val k = 4
    assert(run(docs, k) == reference(docs, k))
  }

  test("repeated invocations do not accumulate persisted blocks (toks leak guard)") {
    // the r15 executor-OOM shape is ACCUMULATION: a persist without a
    // paired unpersist leaves one more corpus-sized cache per invocation.
    // Only the two localCheckpoints (docLens, output) may survive a run —
    // their blocks are constant per invocation and freed by GC — so the
    // persisted-RDD count must be identical after every invocation.
    val docs = (0L until 12L).map(i =>
      (i, (0 until 20).map(j => s"r${i}s$j").mkString(" ") + " common tail here for all"))
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val counts = (1 to 3).map { _ =>
      SuffixDedup.duplicateSpanCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", 4)
        .count()
      val n = spark.sparkContext.getPersistentRDDs.size
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      n
    }
    assert(counts.distinct.size == 1,
      s"persisted-RDD count grew across invocations: $counts")
    // and the survivors are only the two localCheckpoints
    assert(counts.head <= 2, s"unexpected persisted RDDs after a run: ${counts.head}")
  }

  test("randomized corpora agree with the reference (seeded)") {
    val rnd = new scala.util.Random(123)
    val vocab = (0 until 40).map(i => s"t$i")
    val docs = (0L until 15L).map { i =>
      (i, (0 until 40).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    Seq(3, 5, 8).foreach { k =>
      assert(run(docs, k) == reference(docs, k), s"k=$k")
    }
  }
}
