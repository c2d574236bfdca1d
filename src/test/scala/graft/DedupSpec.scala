package graft

import graft.functions.Text
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Recall/precision guarantees of the sketch-based dedup operators — the
  * part the DuckDB oracle can't check (no xxhash64 there).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def randText(seed: Int, words: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(words)("w" + rnd.nextInt(500)).mkString(" ")
  }

  /** 40 random docs + near-dup copies of the first 10 (one word appended). */
  private lazy val corpus = {
    val base = (0 until 40).map(i => (i.toLong, randText(i, 60)))
    val dups = (0 until 10).map(i => (i + 1000L, base(i)._2 + " extra"))
    (base ++ dups).toDF("doc_id", "text")
  }

  test("connectedComponents: chain + clique resolve to component minima") {
    // chain 1-2-...-8 (worst case for naive propagation: diameter 7),
    // clique {20,21,22}, plus an isolated pair {30,31}
    val chain = (1L until 8L).map(i => (i, i + 1))
    val clique = Seq((20L, 21L), (20L, 22L), (21L, 22L))
    val pairs = (chain ++ clique ++ Seq((30L, 31L))).toDF("doc_id_1", "doc_id_2")
    val r = Dedup.connectedComponents(pairs, "doc_id_1", "doc_id_2")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((1L to 8L).forall(r(_) == 1L))
    assert(Seq(20L, 21L, 22L).forall(r(_) == 20L))
    assert(Seq(30L, 31L).forall(r(_) == 30L))
    assert(r.size == 13) // only nodes that appear in pairs
  }

  test("minhashLshIncremental: batch finds its corpus near-dups via the index only") {
    val corpus2 = corpus // 40 base docs + 10 near-dups (ids 1000+)
    val batch = corpus2.filter(col("doc_id") < 5)
      .select((col("doc_id") + 5000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val index = Dedup.minhashBuckets(corpus2, "doc_id", "text", n = 3, k = 64, bands = 16)
    val found = Dedup.minhashLshIncremental(batch, index, corpus2, "doc_id", "text",
      n = 3, k = 64, bands = 16, threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    // every batch doc must find its source (one appended word ~ jaccard .95)
    assert((0L until 5L).forall(i => found.contains((i + 5000, i))))
    // and only new-x-corpus pairs appear
    assert(found.forall { case (n2, c) => n2 >= 5000 && c < 5000 })
  }

  test("contamination: embedded bench doc flagged at full coverage, noise not") {
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "prefix words alpha beta gamma delta suffix words"), // embeds bench
      (11L, "alpha beta unrelated tail here"), // 1 of 3 bench bigrams
      (12L, "totally different content")).toDF("doc_id", "text")
    val r = Dedup.contamination(train, bench, "doc_id", "text", n = 2, minFrac = 0.6)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq((10L, 3L, 1.0))) // all 3 bench bigrams covered
  }

  test("connectedComponents: empty pair set yields empty assignment") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_id_1", "doc_id_2")
    assert(Dedup.connectedComponents(pairs, "doc_id_1", "doc_id_2").count() == 0)
  }

  test("connectedComponents: adversarial monotone chain triggers the chase, bounded rounds") {
    // 0-1-2-...-120 with localSolveEdges = 0 forces pure-distributed
    // contraction on the one-hop worst case: m(i) = i-1 removes ONE node
    // per round, so pure one-hop would need 120 rounds (round 7 measured
    // a 61-node chain not finishing in 10 minutes). The ADAPTIVE guard
    // must detect the stalled first round (shrink ratio ~1 < 2) and flip
    // the chase on; the chased round then drives the whole chain to its
    // single local minimum in ceil(log2 120) = 7 pointer doublings and
    // contracts everything. STRUCTURAL assertion on the round counts —
    // not wall-clock, which flakes both ways (a loaded CI machine fails
    // a correct run; fast hardware hides a partial regression).
    val n = 120L
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("doc_id_1", "doc_id_2")
    val stats = Dedup.connectedComponentsStats(pairs, "doc_id_1", "doc_id_2",
      maxIters = 12, localSolveEdges = 0L)
    val r = stats.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == n + 1 && r.values.forall(_ == 0L), "all nodes must label to the chain minimum")
    assert(stats.chasedRounds >= 1, "stalled shrink must have switched the pointer chase on")
    assert(stats.rounds <= 3,
      s"${stats.rounds} outer rounds on a monotone chain — chase has regressed toward linear")
  }

  test("connectedComponents: random-id path exercises multiple rounds + label checkpoint") {
    // a 90-node path over PERMUTED ids: ~n/3 local minima per round, so
    // contraction runs ~log3(90) ≈ 4 outer rounds — the MULTI-ROUND path,
    // with labelCheckpointEvery = 2 so the label-chain checkpoint fires
    // at least once; distributed all the way down (localSolveEdges = 0)
    val rnd = new scala.util.Random(7)
    val ids = rnd.shuffle((0L until 90L).toVector)
    val pairs = ids.sliding(2).map(w => (w(0), w(1))).toSeq.toDF("doc_id_1", "doc_id_2")
    val r = Dedup.connectedComponents(pairs, "doc_id_1", "doc_id_2",
      maxIters = 12, localSolveEdges = 0L, labelCheckpointEvery = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 90 && r.values.forall(_ == 0L), "one component, labeled by its minimum id")
  }

  test("connectedComponents: randomized graphs match driver union-find, rounds distributed") {
    // differential property test over random topologies (mixed sparse
    // components, self-contained stars, chains, cross links) — the
    // distributed pointer-chase contraction must agree with an
    // independent union-find on every graph
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val nNodes = 40
      val edges = (0 until 50).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter { case (a, b) => a != b }
      // independent union-find ground truth
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n2 => n2 -> {
          var r = n2.toInt; while (parent(r) != r) r = parent(r)
          // normalize to component minimum over nodes IN pairs
          r.toLong
        }).toMap
      // union-find roots are already minima under min-merge, but a root
      // might not appear in any pair — components here are built only
      // from pair nodes, so roots are pair nodes by construction
      val got = Dedup.connectedComponents(
        edges.toDF("doc_id_1", "doc_id_2"), "doc_id_1", "doc_id_2",
        maxIters = 15, localSolveEdges = 0L, labelCheckpointEvery = 3)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got == expected, s"seed $seed: distributed CC != union-find")
    }
  }

  test("duplicateSpans: cross-doc windows count, within-doc repeats and short docs don't") {
    val docs = Seq(
      (1L, "a b c d e"),   // windows: abc bcd cde — shares abc with doc 2
      (2L, "x a b c y"),   // windows: xab abc bcy
      (3L, "z z z z"),     // windows: zzz zzz — repeated WITHIN one doc only
      (4L, "q")            // too short: zero windows
    ).toDF("doc_id", "text")
    val r = Dedup.duplicateSpans(docs, "doc_id", "text", k = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(r(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(r(3L) == ((2L, 0L, 0.0))) // df counts DOCS: self-repeats aren't cross-doc dups
    assert(r(4L) == ((0L, 0L, 0.0)))
  }

  test("spanCoverage: overlapping duplicated windows cover positions once") {
    val docs = Seq(
      (1L, "m n o n o"), // windows: "m n o"(0) "n o n"(1) "o n o"(2) — all cross-doc dup
      (2L, "m n o"),     // "m n o"(0) shared with doc 1
      (3L, "n o n o x"), // "n o n"(0) "o n o"(1) dup; "n o x"(2) unique
      (4L, "q r")        // too short for k=3: zero windows
    ).toDF("doc_id", "text")
    val r = Dedup.spanCoverage(docs, "doc_id", "text", k = 3, maxFrac = 0.9)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4))))
      .toMap
    // doc 1: three overlapping dup windows cover positions 0..4 ONCE -> 5 of 5
    assert(r(1L) == ((5L, 5L, 1.0, false)))
    assert(r(2L) == ((3L, 3L, 1.0, false)))
    // doc 3: windows at 0 and 1 cover positions 0..3 -> 4 of 5
    assert(r(3L) == ((5L, 4L, 0.8, true)))
    assert(r(4L) == ((2L, 0L, 0.0, true)))
  }

  test("hammingPairs64Incremental == full hammingPairs64 restricted to new-x-corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val corpus = (1L to 60L).map(i => (i, rnd.nextLong()))
    // plant near-dups: new ids 101..105 are 1-2 bit flips of corpus sigs
    val fresh = (101L to 105L).map { i =>
      val baseSig = corpus((i % 60).toInt)._2
      (i, baseSig ^ (1L << (i % 64).toInt) ^ (if (i % 2 == 0) 1L << 40 else 0L))
    } ++ Seq((106L, rnd.nextLong()))
    val cdf = corpus.toDF("doc_id", "sig")
    val ndf = fresh.toDF("doc_id", "sig")
    val inc = graft.operators.Dedup
      .hammingPairs64Incremental(ndf, cdf, "sig", maxHamming = 3)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
    val full = graft.operators.Dedup
      .hammingPairs64(cdf.unionByName(ndf), "sig", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
      .filter(t => t._2 > 100L && t._1 <= 60L) // new-x-corpus only (ids ordered)
      .map(t => (t._2, t._1, t._3)).toSet
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc.size >= 5, "the planted flips must all pair")
  }

  test("spanRemoval: excises cross-doc duplicated spans, keeps unique text; within-doc reps untouched") {
    val docs = Seq(
      (1L, "a b c x y z"),   // "a b c"(0..2) shared with doc 2; "x y z" unique
      (2L, "a b c q"),       // "a b c"(0..2) shared -> q survives alone
      (3L, "u v u v u v"),   // within-doc repetition ONLY (df = 1): untouched
      (4L, "s t"),           // too short for k=3: untouched
      (5L, null.asInstanceOf[String]),
      (6L, "")
    ).toDF("doc_id", "text")
    val r = Dedup.spanRemoval(docs, "doc_id", "text", k = 3)
      .collect()
      .map(x => x.getLong(0) ->
        ((if (x.isNullAt(1)) null else x.getString(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(1L) == (("x y z", 6L, 3L)))
    assert(r(2L) == (("q", 4L, 3L)))
    assert(r(3L) == (("u v u v u v", 6L, 0L)), "df=1 grams are gopher's job, not removal's")
    assert(r(4L) == (("s t", 2L, 0L)))
    assert(r(5L) == ((null, 0L, 0L)))
    assert(r(6L) == (("", 0L, 0L)))
  }

  test("connectedComponentsIncremental == full recompute on random split graphs") {
    // random edge sets split arbitrarily into "yesterday" and "today":
    // CC(yesterday) extended with today's edges must equal CC(all edges),
    // including merges ACROSS yesterday's components
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 977)
      val n = 60
      val edges = (0 until 90).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (day1, day2) = edges.partition(_ => rnd.nextBoolean())
      val full = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val assignment = Dedup.connectedComponents(day1.toDF("a", "b"), "a", "b")
      val incr = Dedup.connectedComponentsIncremental(
        assignment, day2.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(incr == full, s"seed $seed: incremental != full recompute")
    }
  }

  test("spanCoverage agrees with duplicateSpans on WHETHER a doc has cross-doc spans") {
    // random-ish docs with planted shared phrases: coverage > 0 exactly when
    // duplicateSpans counts a duplicated window (same df definition), and
    // coverage is bounded by the window fraction's span (overlap collapses)
    val rnd = new scala.util.Random(42)
    val docs = (0 until 40).map { i =>
      val base = Seq.fill(10)(s"t${rnd.nextInt(30)}")
      val planted = if (i % 3 == 0) Seq("shared", "phrase", "here") else Nil
      (i.toLong, (base ++ planted).mkString(" "))
    }.toDF("doc_id", "text")
    val cov = Dedup.spanCoverage(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val dup = Dedup.duplicateSpans(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cov.keySet == dup.keySet)
    cov.keySet.foreach { id =>
      assert((cov(id) > 0) == (dup(id) > 0),
        s"doc $id: covered=${cov(id)} but dup_windows=${dup(id)}")
    }
  }

  test("exact: duplicate text collapses to min id with copy count") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val r = Dedup.exact(docs, "doc_id", "text")
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r == Map(1L -> 2L, 3L -> 1L))
  }

  test("semanticDedup: near-identical embeddings collapse to min id; distinct ones survive") {
    // three well-separated directions; seeds (first 3 ids) land one per
    // group so 3-cell kmeans separates them
    val rows = Seq(
      (1L, Array(1f, 0.010f, 0f)), // group A dup
      (2L, Array(0f, 1f, 0.010f)), // group B dup
      (3L, Array(0.01f, 0f, 1f)), // group C singleton
      (4L, Array(1f, 0.011f, 0f)), // group A dup
      (5L, Array(0f, 1f, 0.012f)), // group B dup
      (7L, Array(1f, 0.009f, 0f)), // group A dup
      (10L, Array(1f, 0.8f, 0f))) // group A cell, but NOT a near-dup
      .toDF("vec_id", "embedding")
    def result(nClusters: Int) = Dedup
      .semanticDedup(rows, "vec_id", "embedding", nClusters, tau = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val r3 = result(3)
    assert(r3.filter(_._2._2).keySet == Set(1L, 2L, 3L, 10L), s"survivors: $r3")
    assert(r3(4L) == (1L, false) && r3(7L) == (1L, false), "A dups collapse to 1")
    assert(r3(5L) == (2L, false), "B dups collapse to 2")
    // one cluster == unblocked all-pairs; groups are separated, so the
    // result is identical — the blocking only removed never-passing pairs
    assert(result(1) == r3)
  }

  test("exactIngestBloom: equals the plain anti-join; bloom routes, never decides") {
    val corpus = (1L to 500L).map(i => (i, s"corpus doc $i text")).toDF("doc_id", "text")
    // 10 exact copies of corpus docs, 10 fresh, one within-batch duplicate
    val batch = ((1L to 10L).map(i => (1000L + i, s"corpus doc $i text")) ++
      (1L to 10L).map(i => (2000L + i, s"fresh doc $i")) ++
      Seq((3001L, "fresh doc 1"))).toDF("doc_id", "text")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("text_md5", "canonical_id", "n_copies")
        .as[(String, Long, Long)].collect().toSet
    val got = asSet(Dedup.exactIngestBloom(corpus, batch, "doc_id", "text", 1000L, 10000L))
    val plain = asSet(Dedup.exact(batch, "doc_id", "text")
      .join(corpus.select(md5($"text").as("text_md5")), Seq("text_md5"), "left_anti"))
    assert(got == plain)
    assert(got.size == 10 && got.forall(_._2 >= 2001L), s"only fresh texts survive: $got")
    assert(got.exists(r => r._2 == 2001L && r._3 == 2L), "within-batch dup collapses to min id")
    // a pathologically tiny filter (fpp ~ 1: every digest is a candidate)
    // changes routing only — the result is still exact
    assert(asSet(Dedup.exactIngestBloom(corpus, batch, "doc_id", "text", 1000L, 64L)) == plain)
    // empty corpus: everything in the batch is new
    val none = Dedup.exactIngestBloom(
      corpus.filter(lit(false)), batch, "doc_id", "text", 1000L, 10000L)
    assert(none.count() == 20)
  }

  test("fingerprint: word order and duplication insensitive") {
    val docs = Seq((1L, "a b c"), (2L, "c b a a"), (3L, "a b d")).toDF("doc_id", "text")
    val r = Dedup.fingerprint(docs, "doc_id", "text").collect()
    assert(r.length == 2)
    assert(r.find(_.getLong(1) == 1L).get.getLong(2) == 2L)
  }

  test("minhashLsh finds every true near-dup pair (recall vs exact jaccard)") {
    val truth = Dedup.ngramJaccard(corpus.withColumn("blk", lit(1)), "doc_id", "text",
      Seq("blk"), n = 3, threshold = 0.5)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(truth.size >= 10, s"fixture should contain near-dups, got ${truth.size}")
    val found = Dedup.minhashLsh(corpus, "doc_id", "text", n = 3, k = 64, bands = 16,
      threshold = 0.5)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    // verify step makes precision exact; banding should catch all 0.5+ pairs here
    assert(found == truth)
  }

  test("minhash signatures drop docs with fewer than n words") {
    val docs = Seq((1L, "only two"), (2L, "one two three four")).toDF("doc_id", "text")
    val ids = Dedup.minhashSignature(docs, "doc_id", "text", n = 3, k = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("simhashPairs: pigeonhole banding has exact recall within maxHamming") {
    val sh = Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = for {
      (i1, h1) <- sh.toSeq; (i2, h2) <- sh.toSeq
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (i1, i2)
    val found = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(found == truth.toSet)
    assert(found.nonEmpty, "near-dup fixture should produce close simhashes")
  }

  test("ivfTopK: probing every cell equals brute force; fewer cells is a subset") {
    val vecs = (0 until 60).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(rnd.nextFloat()))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = pairs(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3))
    val ivfAll = pairs(Similarity.ivfTopK(q, emb, "vec_id", "embedding",
      nCentroids = 6, nProbe = 6, k = 3))
    assert(ivfAll == brute)
    val ivfProbe = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
      nCentroids = 6, nProbe = 2, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    assert(ivfProbe.nonEmpty && ivfProbe.subsetOf(
      pairs(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 60)).map(t => (t._1, t._2))))
    // recall sanity: at least some of the true top-3 survive 2-of-6 probing
    assert((ivfProbe intersect bruteIds).nonEmpty)
  }

  test("ivfAppendReport: counts reconcile and the rebuild flag tracks occupancy skew") {
    // two well-separated axis clusters; centroids = one seed vector in each
    def axisVec(axis: Int, jitter: Float): Array[Float] = {
      val a = Array.fill(4)(jitter); a(axis) = 1f; a
    }
    val old = (0 until 10).map(i => (i.toLong, axisVec(i % 2, 0.01f * (i + 1))))
      .toDF("vec_id", "embedding")
    val cents = old.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))
    val oldIdx = Similarity.ivfAssign(old, "vec_id", "embedding", cents)
    // balanced batch: one vector per cluster -> no rebuild
    val balanced = Seq((100L, axisVec(0, 0.02f)), (101L, axisVec(1, 0.02f)))
      .toDF("vec_id", "embedding")
    val r1 = Similarity.ivfAppendReport(oldIdx, balanced, "vec_id", "embedding", cents)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(r1.map(_._4).sum == 12 && r1.forall(x => x._2 + x._3 == x._4))
    assert(r1.forall(!_._5), "balanced cells must not flag a rebuild")
    // skewed batch: 30 vectors into cell 0 -> fullest cell exceeds 4x mean
    val skewed = (200 until 230).map(i => (i.toLong, axisVec(0, 0.005f * (i - 199))))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.ivfAppendReport(oldIdx, skewed, "vec_id", "embedding", cents,
      rebuildFactor = 1)
    assert(r2.select("rebuild").as[Boolean].collect().forall(identity),
      "a 35-vs-5 split at factor 1 must flag the rebuild")
  }

  test("quantizedTopK: int8 two-phase recovers the exact brute-force top-k") {
    val vecs = (0 until 80).map { i =>
      val rnd = new scala.util.Random(i + 100)
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = pairs(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3))
    val quant = pairs(Similarity.quantizedTopK(q, emb, "vec_id", "embedding", k = 3, refine = 4))
    // the refine margin absorbs int8 rank error: final answer is the exact one
    assert(quant == brute)
  }

  test("pqEncode/pqTopK: codes bounded, deterministic; degenerate PQ is exact; real PQ has recall") {
    // NORMALIZED vectors: dot == cosine, so ADC ranking error comes from
    // quantization alone
    val vecs = (0 until 60).map { i =>
      val rnd = new scala.util.Random(i + 300)
      val raw = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
      (i.toLong, raw.map(x => (x / n).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet

    // codes are 1..ksub, one per subspace, invariant under repartitioning
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", dim = 16, m = 4, ksub = 4)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(enc.size == 60 && enc.values.forall(cs => cs.size == 4 && cs.forall(c => c >= 1 && c <= 4)))
    val enc2 = Similarity.pqEncode(emb.repartition(7), "vec_id", "embedding",
      dim = 16, m = 4, ksub = 4)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(enc2 == enc, "codes are a pure function of (vector, codebook)")

    // DEGENERATE exactness: m=1, ksub=|corpus|, iters=0 makes every vector
    // its own codeword — ADC approx dot IS the exact dot, and on normalized
    // vectors dot ranking == cosine ranking, so PQ == brute force exactly
    val brute = pairs(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3))
    val degenerate = pairs(Similarity.pqTopK(q, emb, "vec_id", "embedding",
      dim = 16, m = 1, ksub = 60, k = 3, refine = 1))
    assert(degenerate == brute)

    // real compression (4x4 codebooks): generous refine recovers most of
    // the true top-3; Lloyd refinement must not error or collapse recall
    def recall(r: Set[(Long, Long, Int)]): Double =
      (r.map(t => (t._1, t._2)) intersect brute.map(t => (t._1, t._2))).size.toDouble / brute.size
    val pq = pairs(Similarity.pqTopK(q, emb, "vec_id", "embedding",
      dim = 16, m = 4, ksub = 4, k = 3, refine = 8))
    assert(recall(pq) >= 0.5, s"PQ recall collapsed: ${recall(pq)} of $brute vs $pq")
    val pqLloyd = pairs(Similarity.pqTopK(q, emb, "vec_id", "embedding",
      dim = 16, m = 4, ksub = 4, k = 3, refine = 8, kmeansIters = 1))
    assert(recall(pqLloyd) >= 0.5)
  }

  test("ivfPqTopK: degenerate PQ + all cells probed equals brute force; keyed joins only") {
    val vecs = (0 until 60).map { i =>
      val rnd = new scala.util.Random(i + 300)
      val raw = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
      (i.toLong, raw.map(x => (x / n).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = pairs(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3))
    // every cell probed + every-vector-its-own-codeword PQ: phase 1 scores
    // the exact dot for every candidate, so the composition IS brute force
    // (normalized vectors make dot ranking == cosine ranking)
    val exact = pairs(Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
      dim = 16, m = 1, ksub = 60, nCentroids = 6, nProbe = 6, k = 3, refine = 1))
    assert(exact == brute)
    // real compression + real probing stays keyed end to end and keeps recall
    val probed = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
      dim = 16, m = 4, ksub = 4, nCentroids = 6, nProbe = 3, k = 3, refine = 8)
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"ivfPqTopK must plan keyed joins only:\n$plan")
    val got = pairs(probed).map(t => (t._1, t._2))
    assert(got.nonEmpty && (got intersect brute.map(t => (t._1, t._2))).nonEmpty)
  }

  test("ivfQuantizedTopK: all cells probed + full refine equals brute force; probing is sub-quadratic-shaped") {
    val vecs = (0 until 80).map { i =>
      val rnd = new scala.util.Random(i + 100)
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = pairs(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3))
    // nProbe == nCentroids and refine*k >= |corpus|: phase 1 keeps every
    // candidate, so the float re-rank IS brute force
    val all = pairs(Similarity.ivfQuantizedTopK(q, emb, "vec_id", "embedding",
      nCentroids = 6, nProbe = 6, k = 3, refine = 30))
    assert(all == brute)
    // real probing: results come from probed cells only and stay a subset
    // of the full candidate universe
    val probed = Similarity.ivfQuantizedTopK(q, emb, "vec_id", "embedding",
      nCentroids = 6, nProbe = 2, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(probed.nonEmpty && (probed intersect brute.map(t => (t._1, t._2))).nonEmpty)
    // the plan is keyed end to end: literal-centroid assignment means no
    // nested-loop join anywhere, unlike ivfTopK's broadcast argmax
    val plan = Similarity.ivfQuantizedTopK(q, emb, "vec_id", "embedding",
      nCentroids = 6, nProbe = 2, k = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"ivfQuantizedTopK must plan keyed joins only:\n$plan")
  }

  test("kmeans-refined IVF: single-probe search is exact on well-separated clusters") {
    // 4 tight clusters along orthogonal axes of an 8-dim space: after Lloyd
    // refinement each cluster owns one centroid, so probing ONE cell per
    // query already recovers the true in-cluster top-3
    val vecs = (0 until 200).map { i =>
      val cluster = i % 4
      val rnd = new scala.util.Random(i)
      val base = Array.fill(8)(0.02f * rnd.nextFloat())
      base(cluster * 2) = 1.0f + 0.05f * rnd.nextFloat()
      (i.toLong, base)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = pairs(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3))
    val ivf1 = pairs(Similarity.ivfTopK(q, emb, "vec_id", "embedding",
      nCentroids = 4, nProbe = 1, k = 3, kmeansIters = 2))
    assert(ivf1 == brute)
    // centroid refinement converges to <= k cells of the right dimensionality
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 2)
      .select("centroid").as[Array[Double]].collect()
    assert(cents.length <= 4 && cents.forall(_.length == 8))
  }

  test("embeddingNearDup and lshTopK agree with brute force inside a bucket") {
    val vecs = (0 until 30).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(rnd.nextFloat()))
    } :+ (999L, {
      val rnd = new scala.util.Random(3)
      Array.fill(16)(rnd.nextFloat() * 1.0001f) // near-copy of vec 3
    })
    val emb = vecs.toDF("vec_id", "embedding")
    // a positively-scaled copy projects to the same sign on EVERY hyperplane,
    // so the pair shares all band buckets regardless of banding parameters
    val pairs = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      bands = 2, planesPerBand = 2, threshold = 0.999)
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 999L)))
    val topk = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 3), emb,
      "vec_id", "embedding", k = 1).select("neighbor_id").as[Long].head()
    assert(topk == 999L)
  }

  test("ngramJaccardIndexed equals blocked all-pairs exactly; maxDf only drops stop-shingle overlap") {
    val blocked = Dedup.ngramJaccard(corpus.withColumn("blk", lit(1)),
      "doc_id", "text", blockCols = Seq("blk"), n = 2, threshold = 0.2)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)].collect().toSet
    val indexed = Dedup.ngramJaccardIndexed(corpus, "doc_id", "text", n = 2, threshold = 0.2)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(indexed == blocked && indexed.nonEmpty)
    // a df cap can only shrink the result (undercounted intersections)
    val capped = Dedup.ngramJaccardIndexed(corpus, "doc_id", "text", n = 2,
      threshold = 0.2, maxDf = 3)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(indexed.map(p => (p._1, p._2))))
  }

  test("minhashLsh maxBucket: duplicate floods drop whole buckets, normal near-dups survive") {
    // 30 exact copies share EVERY band bucket (identical signatures) — the
    // degenerate O(size^2) case the cap exists for — plus one normal
    // near-dup pair in its own buckets
    val boiler = (0 until 30).map(i => (i.toLong, randText(999, 40)))
    val docs = (boiler ++ Seq((100L, randText(5, 60)), (101L, randText(5, 60) + " extra")))
      .toDF("doc_id", "text")
    def pairsOf(maxBucket: Int) =
      Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 16, bands = 4,
        threshold = 0.5, maxBucket = maxBucket)
        .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    val uncapped = pairsOf(Int.MaxValue)
    assert(uncapped.contains((100L, 101L)) && uncapped.size == 435 + 1) // C(30,2) flood pairs
    assert(pairsOf(10) == Set((100L, 101L))) // flood buckets (30 > 10) dropped whole
  }

  test("banded LSH: per-band-bucket occupancy is bounded well below the corpus") {
    // the bucket self-join is O(size^2) per (band, bucket) group — the scale
    // contract is that no single bucket concentrates the corpus
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val occupancy = emb
      .select(col("vec_id"),
        posexplode(graft.functions.Vectors.bandedBuckets(col("embedding"), 4, 4)))
      .toDF("vec_id", "band", "bucket")
      .groupBy("band", "bucket").count()
    val maxBucket = occupancy.agg(max("count")).as[Long].head()
    assert(maxBucket * 4 <= n,
      s"largest band bucket holds $maxBucket of $n vectors — banding is not splitting")
  }
}

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles: n-grams distinct, short docs empty") {
    val r = Seq(Tuple1("a b c d"), Tuple1("a b")).toDF("t")
      .select(Text.wordShingles(col("t"), 3)).as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1).isEmpty)
  }

  test("langId picks the marker-dominant language, 'und' with no markers") {
    val r = Seq("the cat and the dog is in it", "el que de la y los", "zzz qqq")
      .toDF("t").select(Text.langId(col("t"))).as[String].collect()
    assert(r.toSeq == Seq("en", "es", "und"))
  }

  test("jaccard of shingle sets") {
    val r = Seq(("a b c", "b c d")).toDF("x", "y")
      .select(Text.jaccard(Text.wordShingles(col("x"), 1), Text.wordShingles(col("y"), 1)))
      .as[Double].head()
    assert(r == 0.5) // {b,c} over {a,b,c,d}
  }

  test("redactPii: typed placeholders, email wins over URL-host and digit runs") {
    val r = Seq(
      "mail a.b+c@host.co.uk now",
      "go to https://x.io/p?q=1 then stop",
      "call +1 (555) 012-3499 ok",
      "order 1234567890 shipped",
      "short 12345 stays").toDF("t")
      .select(Text.redactPii(col("t"))).as[String].collect()
    assert(r(0) == "mail <EMAIL> now")
    assert(r(1) == "go to <URL> then stop")
    assert(r(2) == "call <PHONE> ok")
    assert(r(3) == "order <NUM> shipped")
    assert(r(4) == "short 12345 stays") // 5 digits: below both thresholds
  }

  test("chunkWords: stride windows, overlap duplicated, short tail, empty -> none") {
    val r = Seq(Tuple1("a b c d e"), Tuple1("a b"), Tuple1(""))
      .toDF("t")
      .select(Text.chunkWords(Text.words(col("t")), size = 3, overlap = 1))
      .as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "c d e", "e")) // stride 2; trailing window kept
    assert(r(1) == Seq("a b")) // shorter than size: one chunk
    assert(r(2).isEmpty) // empty doc: no chunks
    // trailing tail shorter than overlap still emitted
    val tail = Seq(Tuple1("a b c d")).toDF("t")
      .select(Text.chunkWords(Text.words(col("t")), 3, 1)).as[Seq[String]].head()
    assert(tail == Seq("a b c", "c d"))
  }

  test("canonicalizeUrl: case, www, tracking params, fragments and trailing slash collapse; paths survive") {
    val cases = Seq(
      // tracking param mid-query, fragment, host case, www
      "HTTPS://WWW.Site.Example/Path/?utm_source=a&id=7#frag" ->
        "https://site.example/Path/?id=7",
      // tracking param LAST: dangling ? cleaned, then trailing slash
      "http://site.example/a/?utm_campaign=x" -> "http://site.example/a",
      // only tracking params: whole query collapses
      "https://Site.example?fbclid=abc&gclid=def" -> "https://site.example",
      // path case preserved, non-tracking params survive in order
      "https://a.example/CaseSensitive?a=1&ref=spam&b=2" ->
        "https://a.example/CaseSensitive?a=1&b=2",
      // tracking FIRST with a real param after: the ? re-anchors
      "https://b.example/x?utm_medium=m&keep=1" -> "https://b.example/x?keep=1",
      // `href=` has no [?&] boundary — must pass through untouched
      "https://c.example/p?href=ok&utm_a=1" -> "https://c.example/p?href=ok",
      // already canonical: fixed point
      "https://site.example/p?id=3" -> "https://site.example/p?id=3")
    val got = cases.map(_._1).toDF("u")
      .select(graft.functions.Text.canonicalizeUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
    // idempotence: canonicalizing a canonical URL changes nothing
    val twice = cases.map(_._2).toDF("u")
      .select(graft.functions.Text.canonicalizeUrl(col("u"))).as[String].collect().toSeq
    assert(twice == cases.map(_._2))
  }

  test("sentences: terminal runs split, trailing fragment kept, empties dropped") {
    val got = Seq("One here. Two there! Three? tail fragment", "", "...", "no punct at all")
      .toDF("t").select(graft.functions.Text.sentences(col("t"))).as[Seq[String]].collect()
    assert(got(0) == Seq("One here.", "Two there!", "Three?", "tail fragment"))
    assert(got(1) == Seq() && got(2) == Seq(), "empty / punctuation-only: no sentences")
    assert(got(3) == Seq("no punct at all"))
  }

  test("normalizeWhitespace collapses runs and trims") {
    val r = Seq(Tuple1("  a \t b\n\nc  ")).toDF("t")
      .select(Text.normalizeWhitespace(col("t"))).as[String].head()
    assert(r == "a b c")
  }

  test("containment finds an excerpt its Jaccard cannot see") {
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, long),
      (2L, "gamma delta epsilon zeta eta"), // 4 bigrams, all inside doc 1
      (3L, "unrelated words entirely different")).toDF("doc_id", "text")
    val cont = graft.operators.Dedup
      .ngramContainmentIndexed(docs, "doc_id", "text", n = 2, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2")) ->
        r.getAs[Double]("containment")).toMap
    assert(cont.keySet == Set((1L, 2L)) && cont((1L, 2L)) == 1.0)
    // the symmetric form rejects the same pair: union is dominated by doc 1
    val jac = graft.operators.Dedup
      .ngramJaccardIndexed(docs, "doc_id", "text", n = 2, threshold = 0.8).count()
    assert(jac == 0)
  }

  test("splitLeakageReport counts straddling pairs; empty pairs -> null rate") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_id_1", "doc_id_2")
    val asg = Seq((1L, "train"), (2L, "train"), (3L, "train"), (4L, "val"),
      (5L, "val"), (6L, "train")).toDF("doc_id", "split")
    val r = graft.operators.Dedup.splitLeakageReport(pairs, asg).head()
    assert(r.getAs[Long]("n_pairs") == 3L && r.getAs[Long]("n_cross") == 2L &&
      r.getAs[Double]("leak_rate") == 2.0 / 3.0)
    val empty = graft.operators.Dedup.splitLeakageReport(
      Seq.empty[(Long, Long)].toDF("doc_id_1", "doc_id_2"), asg).head()
    assert(empty.getAs[Long]("n_pairs") == 0L &&
      empty.isNullAt(empty.fieldIndex("leak_rate")))
  }

  test("pairSetReport: exact counts, null-guarded ratios") {
    def pairs(ps: (Long, Long)*) = ps.toDF("doc_id_1", "doc_id_2")
    val truth = pairs((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
    val approx = pairs((1L, 2L), (2L, 3L), (6L, 7L))
    val r = graft.operators.Dedup.pairSetReport(truth, approx).head()
    assert(r.getAs[Long]("n_truth") == 4L && r.getAs[Long]("n_approx") == 3L &&
      r.getAs[Long]("n_hit") == 2L)
    assert(r.getAs[Double]("recall") == 0.5 && r.getAs[Double]("precision") == 2.0 / 3.0)
    // empty approx: precision null, recall 0; empty truth: recall null
    val r2 = graft.operators.Dedup.pairSetReport(truth, pairs()).head()
    assert(r2.getAs[Double]("recall") == 0.0 && r2.isNullAt(r2.fieldIndex("precision")))
    val r3 = graft.operators.Dedup.pairSetReport(pairs(), approx).head()
    assert(r3.isNullAt(r3.fieldIndex("recall")) && r3.getAs[Double]("precision") == 0.0)
  }
}
