package graft

import graft.functions.{Scalars, Text}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests mirroring the reference's runtime DQ invariants
  * (SURVEY.md §5.3): clamp bounds, non-negative diffs, order-independent
  * exact sums, set-measure bounds.
  */
class PropertiesSpec extends SparkSpec {

  /** Raw-scalacheck sampling (no scalatestplus bridge in the offline deps):
    * draw `n` generated cases and run the assertion block on each.
    */
  private def forSamples[A](g: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(f)

  import spark.implicits._

  private val finiteD = Gen.chooseNum(-1e9, 1e9)

  test("healthFactor: lower-clamped at 1e-6; zero debt hits the 1e6 sentinel exactly") {
    // NB: the reference clamps only the LOWER bound — a huge-collateral /
    // tiny-debt ratio legitimately exceeds 1e6 (the 1e6 is a no-debt
    // sentinel, not an upper cap); replicated faithfully.
    forSamples(Gen.listOfN(50, Gen.zip(Gen.chooseNum(0.0, 1e9), Gen.chooseNum(0.0, 1e9)))) { pairs: List[(Double, Double)] =>
        if (pairs.nonEmpty) {
          val rows = pairs.toDF("n", "d")
            .select(col("d"), Scalars.healthFactor(col("n"), col("d")).as("hf"))
            .collect()
          assert(rows.forall(_.getDouble(1) >= Scalars.HealthFactorMin))
          assert(rows.filter(_.getDouble(0) == 0.0)
            .forall(_.getDouble(1) == Scalars.HealthFactorMax))
        }
    }
  }

  test("clampDiff is never negative") {
    forSamples(Gen.listOfN(50, Gen.zip(finiteD, finiteD))) { pairs: List[(Double, Double)] =>
      if (pairs.nonEmpty) {
        val ds = pairs.toDF("a", "b")
          .select(Scalars.clampDiff(col("a"), col("b"))).as[Double].collect()
        assert(ds.forall(_ >= 0.0))
      }
    }
  }

  test("dsum is partition-order independent (decimal-exact accumulation)") {
    forSamples(Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v * 100) / 100))) { xs: List[Double] =>
        if (xs.nonEmpty) {
          val a = xs.toDF("v").repartition(7).agg(Scalars.dsum(col("v"))).head().getDouble(0)
          val b = xs.reverse.toDF("v").repartition(3).agg(Scalars.dsum(col("v"))).head().getDouble(0)
          assert(a == b)
        }
    }
  }

  test("jaccard is within [0,1], symmetric, and 1 for identical docs") {
    forSamples(Gen.listOfN(8, Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e")))) { docs: List[List[String]] =>
        if (docs.nonEmpty) {
          val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
            .toDF("doc_id", "text")
          val sh = Text.wordShingles(col("text"), 1)
          val pairs = df.as("x").crossJoin(df.as("y"))
            .select(
              Text.jaccard(
                Text.wordShingles(col("x.text"), 1),
                Text.wordShingles(col("y.text"), 1)).as("j"),
              (col("x.doc_id") === col("y.doc_id")).as("same"))
            .collect()
          assert(pairs.forall(r => r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
          assert(pairs.filter(_.getBoolean(1)).forall(_.getDouble(0) == 1.0))
        }
    }
  }

  test("hashSample: monotone in rate (a higher rate keeps a superset)") {
    forSamples(Gen.zip(Gen.chooseNum(0.05, 0.5), Gen.chooseNum(0.5, 0.95)), n = 5) {
      case (lo: Double, hi: Double) =>
        val df = (1L to 500L).toDF("k")
        val small = graft.quality.Selection.hashSample(df, "k", lo)
          .as[Long].collect().toSet
        val big = graft.quality.Selection.hashSample(df, "k", hi)
          .as[Long].collect().toSet
        assert(small.subsetOf(big), s"rate $lo not nested in $hi")
    }
  }

  test("packByTokenBudget: pack ids are contiguous from 0 and non-decreasing in id order") {
    forSamples(Gen.listOfN(40, Gen.chooseNum(1L, 3000L)), n = 10) { tokens: List[Long] =>
      if (tokens.nonEmpty) {
        val docs = tokens.zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }
          .toDF("doc_id", "shard", "n_tokens")
        val out = graft.quality.Selection
          .packByTokenBudget(docs, "doc_id", "n_tokens", budget = 4096, shardCol = "shard")
          .orderBy("doc_id").select("pack_id").as[Long].collect()
        assert(out.head == 0L)
        assert(out.sliding(2).forall(w => w.length < 2 || w(1) - w(0) >= 0))
      }
    }
  }

  test("zeroToSentinel preserves non-zero values and never emits 0") {
    forSamples(Gen.listOfN(50, Gen.chooseNum(0L, 1000L))) { xs: List[Long] =>
      if (xs.nonEmpty) {
        val out = xs.toDF("x").select(Scalars.zeroToSentinel(col("x"))).as[Long].collect()
        assert(out.forall(_ != 0L))
        assert(xs.zip(out).forall { case (in, o) => in == 0L && o == 999999999L || in == o })
      }
    }
  }

  test("chunkWords reassembles losslessly: head chunk + overlap-stripped tails == words") {
    val gen = Gen.zip(
      Gen.chooseNum(0, 40), // word count
      Gen.chooseNum(2, 8), // size
      Gen.chooseNum(0, 1)) // overlap selector
    forSamples(gen, n = 15) { case (nw, size, ovSel) =>
      val overlap = math.min(ovSel * (size / 2), size - 1)
      val text = (0 until nw).map(i => s"w$i").mkString(" ")
      val chunks = Seq(Tuple1(text)).toDF("t")
        .select(graft.functions.Text.chunkWords(graft.functions.Text.words(col("t")), size, overlap))
        .as[Seq[String]].head()
      val words = if (nw == 0) Seq.empty else (0 until nw).map(i => s"w$i")
      val reassembled =
        if (chunks.isEmpty) Seq.empty
        else chunks.head.split(" ").toSeq ++
          chunks.tail.flatMap(_.split(" ").drop(overlap))
      assert(reassembled == words,
        s"nw=$nw size=$size overlap=$overlap chunks=$chunks")
    }
  }

  test("connectedComponents == driver-side union-find on random graphs") {
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(0L, 19L), Gen.chooseNum(0L, 19L)))
      .map(_.filter { case (a, b) => a != b })
    forSamples(edgeGen, n = 8) { edges: List[(Long, Long)] =>
      if (edges.nonEmpty) {
        // reference: plain union-find with path compression
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // union-find roots are not necessarily component minima; normalize
        val byRoot = nodes.groupBy(find)
        val expect = byRoot.values.flatMap(ns => ns.map(_ -> ns.min)).toMap
        // all three execution paths must agree with the reference:
        // default (pure driver solve), localSolveEdges = 0 (pure
        // distributed fixpoint), and a 4-edge threshold (distributed
        // rounds + coarsest-level driver finish).
        for (threshold <- Seq(1L << 20, 0L, 4L)) {
          val got = graft.operators.Dedup
            .connectedComponents(edges.toDF("a", "b"), "a", "b",
              localSolveEdges = threshold)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == expect, s"localSolveEdges=$threshold")
        }
      }
    }
  }

  test("zOrderValue: injective on the 16-bit grid and equals reference bit interleave") {
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i)))
        .reduce(_ | _)
    forSamples(Gen.listOfN(200, Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L))), n = 5) {
      pairs: List[(Long, Long)] =>
        val rows = pairs.toDF("a", "b")
          .select(col("a"), col("b"),
            graft.sources.Layout.zOrderValue(col("a"), col("b")).as("z"))
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        rows.foreach { case ((a, b), z) =>
          assert(z == morton(a, b), s"z($a, $b) = $z, expected ${morton(a, b)}")
          assert(z >= 0 && z < (1L << 32))
        }
        // injectivity: distinct pairs get distinct z values
        assert(rows.toMap.size == rows.map(_._1).distinct.length)
    }
  }

  test("scoring invariants on random corpora: surprisal >= 0, classifier bounded, buckets partition") {
    val word = Gen.oneOf((1 to 25).map(i => s"v$i"))
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    forSamples(Gen.listOfN(40, doc), n = 3) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val wc = texts.map(_.split(" +").count(_.nonEmpty))
      // bigram surprisal: non-negative (interpolated p <= 1), one pair per
      // adjacent word, rows exactly for docs with >= 2 words
      val bs = graft.quality.Scoring.bigramSurprisal(docs, "doc_id", "text")
        .select("doc_id", "surprisal", "n_bigrams").as[(Long, Double, Long)]
        .collect().map(x => x._1 -> ((x._2, x._3))).toMap
      assert(bs.keySet == wc.indices.filter(wc(_) >= 2).map(_.toLong).toSet)
      bs.foreach { case (id, (s, nb)) =>
        assert(s >= 0.0, s"doc $id surprisal $s < 0")
        assert(nb == wc(id.toInt) - 1, s"doc $id pairs $nb != ${wc(id.toInt) - 1}")
      }
      // classifier: score bounded, keep consistent with the threshold
      val cs = graft.quality.Scoring.hashedClassifierScore(docs, "doc_id", "text")
        .select("n_features", "score", "keep").as[(Long, Double, Boolean)].collect()
      cs.foreach { case (nf, s, k) =>
        assert(s >= -1.0 && s <= 1.0)
        assert(k == (nf > 0 && s >= 0.0))
      }
      // perplexity buckets partition the scored docs and sizes track n/3
      if (wc.exists(_ > 0)) {
        val pb = graft.quality.Scoring.perplexityBuckets(docs, "doc_id", "text")
          .select("doc_id", "bucket").as[(Long, String)].collect()
        val scoredDocs = wc.indices.filter(wc(_) >= 1).map(_.toLong).toSet
        assert(pb.map(_._1).toSet == scoredDocs, "every tokenized doc lands in one bucket")
        val n = scoredDocs.size
        val sizes = pb.groupBy(_._2).view.mapValues(_.length).toMap
        assert(sizes.getOrElse("head", 0) == n / 3)
        assert(sizes.getOrElse("middle", 0) == 2 * n / 3 - n / 3)
        assert(sizes.getOrElse("tail", 0) == n - 2 * n / 3)
      }
    }
  }

  test("canonicalizeUrl is idempotent and total on adversarial URL-ish strings") {
    // a canonicalizer that isn't a fixed point on its own output corrupts
    // dedup keys on re-processing — the core contract, checked on randomly
    // assembled schemes/hosts/paths/params including the tracking family,
    // bare ?/&/# punctuation, and non-URL junk (must pass through, never
    // throw)
    val scheme = Gen.oneOf("http://", "https://", "HTTPS://", "HtTp://", "")
    val host = Gen.oneOf("www.Site.Example", "a.example", "WWW.X.Y", "site", "")
    val seg = Gen.oneOf("/Path", "/p/Q", "", "/", "/CaseS")
    val param = Gen.oneOf("utm_source=1", "utm_a=", "fbclid=zz", "ref=r", "gclid=",
      "id=7", "a=1", "href=ok", "xref=2", "", "&", "?")
    val frag = Gen.oneOf("", "#f", "#", "#x y")
    val urlGen = for {
      s <- scheme; h <- host; p <- seg
      ps <- Gen.listOf(param).map(_.take(4))
      f <- frag
    } yield s + h + p + (if (ps.nonEmpty) "?" + ps.mkString("&") else "") + f
    forSamples(Gen.listOfN(60, urlGen), n = 5) { urls: List[String] =>
      if (urls.nonEmpty) {
        val once = urls.toDF("u")
          .select(Text.canonicalizeUrl(col("u"))).as[String].collect().toSeq
        val twice = once.toDF("u")
          .select(Text.canonicalizeUrl(col("u"))).as[String].collect().toSeq
        once.zip(twice).zip(urls).foreach { case ((o, t), raw) =>
          assert(o == t, s"not idempotent on '$raw': '$o' -> '$t'")
        }
      }
    }
  }

  test("extractHtmlText: exact on a known page; total + idempotent on adversarial markup") {
    // the known-page case pins the chain's semantics (block elements
    // swallowed whole, comments gone, entities decoded once, whitespace
    // collapsed); the generated cases then stress the order-sensitivity
    // corners — unclosed tags, bare </</> punctuation, stray entities,
    // nested fake tags inside script strings
    val page = """<!DOCTYPE html><html><head><title>T</title><style>.x{c:red}</style>
      <script>var a="<div>fake</div>";</script></head><body><!-- note -->
      <h1>Head</h1><p>alpha &amp; beta</p><div>x &lt;b&gt;&nbsp;y</div></body></html>"""
    val got = Seq(page).toDF("h")
      .select(Text.extractHtmlText(col("h"))).as[String].head()
    assert(got == "Head alpha & beta x <b> y", s"got '$got'")
    val tag = Gen.oneOf("<div>", "</div>", "<p class=\"x\">", "<script>", "</script>",
      "<style>", "<!--", "-->", "<br/>", "<SPAN>", "<", ">", "<<>>", "<a href='x?y=1'>",
      "<script type=js>", "</style >", "<head>", "</head>")
    val word = Gen.oneOf("alpha", "beta gamma", "1 2", "", "  ", "\n")
    val ent = Gen.oneOf("&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;",
      "&bogus;", "&#x41;", "&amp;lt;")
    val docGen = Gen.listOf(Gen.oneOf(tag, word, ent)).map(_.take(12).mkString(""))
    forSamples(Gen.listOfN(40, docGen), n = 5) { docs: List[String] =>
      if (docs.nonEmpty) {
        // total: the chain never throws and never nulls a non-null input
        val once = docs.toDF("h")
          .select(Text.extractHtmlText(col("h"))).as[String].collect().toSeq
        assert(once.forall(_ != null))
        // idempotent on ENTITY-FREE INPUT (entity decoding is the one
        // documented asymmetry: `&lt;b&gt;` correctly surfaces literal
        // markup-looking text a second pass would strip — so the filter
        // must be on the input, not on the `&`-freeness of the output)
        val entityFree = docs.filter(!_.contains("&"))
        if (entityFree.nonEmpty) {
          val one = entityFree.toDF("h")
            .select(Text.extractHtmlText(col("h"))).as[String].collect().toSeq
          val two = one.toDF("h")
            .select(Text.extractHtmlText(col("h"))).as[String].collect().toSeq
          one.zip(two).zip(entityFree).foreach { case ((o, t), raw) =>
            assert(o == t, s"not idempotent on '$raw': '$o' -> '$t'")
          }
        }
      }
    }
  }
}
