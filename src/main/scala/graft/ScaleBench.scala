package graft

import graft.functions.Text
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE-EXPONENT probe: measures how the riskiest operators actually
  * scale with corpus size, instead of arguing it from the plan shape.
  *
  * No scale factor above sf0.1 ships in the testdata, so k× corpora are
  * DERIVED from the driver's own documents/embeddings tables (never
  * synthesized from scratch): k id-shifted copies, each copy's text
  * salted on alternating words with a copy-unique suffix. Every word
  * trigram contains at least one salted word, so copies share no
  * shingles — near-dup structure does NOT grow quadratically with k by
  * construction. Each copy then gets the standard 25 planted " xq"
  * mutations so the verify stages do real, linearly-growing work.
  * Embedding copies perturb each float by a copy-scaled epsilon; the ANN
  * query set stays FIXED (copy-0 ids) because the honest ANN cost model
  * is queries × corpus — scaling both sides measures k², not the
  * operator.
  *
  * For each op and each k the op runs `runs` times end to end (scan
  * included — no caching, the scan is part of the cost); the median is
  * recorded and the scaling exponent alpha fits
  * `t(k_max)/t(k_min) = (k_max/k_min)^alpha`. Linear ops show alpha ≈ 1
  * (plus sub-linear fixed overhead pulling it DOWN at these sizes);
  * a quadratic candidate blow-up would show alpha → 2 between the top
  * two points. One JSON line on stdout, same contract as [[Bench]].
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SCALE_KS (default "1,4,16"), SPARK_GRAFT_SCALE_RUNS
  * (default 3), SPARK_GRAFT_SCALE_OPS (comma list; default all — lets a
  * single-op investigation run 5+ runs without paying for the others).
  */
object ScaleBench {

  /** Id stride between copies — far above any testdata doc_id. */
  private val Stride = 1000000L

  /** Planted-clone id offset — above every shifted copy. */
  private val CloneOff = 100000000L

  /** Copy j of the corpus: ids shifted by j*Stride; for j > 0 every
    * alternating word gets a copy-unique suffix (kills every shared
    * trigram across copies while keeping realistic word statistics).
    */
  private def docCopy(docs: DataFrame, j: Int): DataFrame = {
    val shifted = docs.select((col("doc_id") + lit(j * Stride)).as("doc_id"), col("text"))
    if (j == 0) shifted
    else shifted.select(
      col("doc_id"),
      concat_ws(" ", transform(Text.words(col("text")),
        (w, i) => when(pmod(i, lit(2)) === 0, concat(w, lit("_c" + j))).otherwise(w)))
        .as("text"))
  }

  /** k-times corpus with 25 planted near-dups per copy. */
  private def corpusAt(docs: DataFrame, k: Int): DataFrame = {
    val copies = (0 until k).map(docCopy(docs, _)).reduce(_ unionByName _)
    val planted = copies.filter(pmod(col("doc_id"), lit(Stride)) < 25)
      .select((col("doc_id") + lit(CloneOff)).as("doc_id"),
        concat(col("text"), lit(" xq")).as("text"))
    copies.unionByName(planted)
  }

  /** k-times embeddings: ids shifted, each component nudged by a
    * copy-scaled epsilon (distinct vectors, same geometry).
    */
  private def embAt(emb: DataFrame, k: Int): DataFrame =
    (0 until k).map { j =>
      val shifted = emb.select((col("vec_id") + lit(j * Stride)).as("vec_id"),
        col("embedding"), col("label"))
      if (j == 0) shifted
      else shifted.select(col("vec_id"),
        transform(col("embedding"), x => (x + lit(j * 1e-3)).cast("float")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val ks = sys.env.getOrElse("SPARK_GRAFT_SCALE_KS", "1,4,16")
      .split(",").map(_.trim.toInt).toSeq.distinct.sorted
    require(ks.size >= 2, s"SPARK_GRAFT_SCALE_KS needs >= 2 distinct points to fit an exponent, got $ks")
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.SnapCatalog")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = Tables.documents(spark, sfDir).select("doc_id", "text")
    val emb0 = Tables.embeddings(spark, sfDir)

    // Materialize each derived corpus to parquet ONCE (outside every timed
    // region) and time the ops over the parquet read. The k-way unionByName
    // plan is a measurement artifact at larger k: every task binary carries
    // the whole k-branch plan (observed 1.3-2 MiB task broadcasts at k=16)
    // and per-branch scan stages multiply scheduler overhead — the r8 solo
    // probe measured sim_ivf_quantized alpha_top 1.14 THROUGH the union
    // plan vs ~1.0 over parquet. A real 100 TB corpus is a parquet scan,
    // not a 16-branch union, so the parquet form is the honest probe.
    val scaleDir = "target/scale_bench"
    val written = scala.collection.mutable.Set.empty[String]
    def matRead(df: => DataFrame, path: String): DataFrame = {
      // written on first use (the warmup pass), cached on disk for the runs
      if (written.add(path)) df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    def docsAt(k: Int): DataFrame = matRead(corpusAt(docs0, k), s"$scaleDir/docs_k$k")
    def embsAt(k: Int): DataFrame = matRead(embAt(emb0, k), s"$scaleDir/emb_k$k")

    // k disjoint copies of the 2048-node interaction graph (node ids
    // shifted by j*4096, max id 64*4096 << the 2^20 packing cap): edges —
    // the triangle cost axis — grow exactly k x with constant per-copy
    // density, so a linear fit proves the wedge join does no cross-copy
    // work (a global sort, an all-nodes broadcast, or a lost orientation
    // would all show up superlinear)
    val ev0 = Tables.events(spark, sfDir).select("user_id", "event_id", "event_type")

    // k x fuzzy-join fixture: label vocab over k id-shifted user copies
    // (distinct labels per copy), queries = the md5-picked corrupted subset
    def labelsAt(k: Int): (DataFrame, DataFrame) = {
      val v = matRead(
        (0 until k).map { j =>
          ev0.select(concat(col("event_type"), lit("-u"),
            (col("user_id") + lit(j * Stride)).cast("string")).as("w"))
        }.reduce(_ unionByName _).distinct(), s"$scaleDir/labels_k$k")
      val q = v.select(col("w").as("src"),
          graft.functions.Text.md5Hash64(col("w")).as("h"))
        .filter(col("h") % 7L === 0L)
        .select(col("src"), expr(
          "substr(src, 1, cast(h % (length(src) - 2) as int) + 1) || " +
            "substr(src, cast(h % (length(src) - 2) as int) + 3)").as("qs"))
      (q, v)
    }
    def edgesAt(k: Int): DataFrame = matRead(
      (0 until k).map { j =>
        ev0.select(
          (pmod(col("user_id"), lit(2048L)) + lit(j * 4096L)).as("u"),
          (pmod(col("event_id"), lit(2048L)) + lit(j * 4096L)).as("v"))
      }.reduce(_ unionByName _), s"$scaleDir/edges_k$k")

    // k x sessions fixture for the interval-overlap probe: id-shifted user
    // copies share the SAME 30-day window, so the right side's per-bin
    // density grows exactly k x while the probe set (copy-0 users) stays
    // fixed — per-probe candidates then grow k x, and a linear fit proves
    // the binned join pays candidates, not pairs (an unkeyed or unbinned
    // form would meet k x probes x k x sessions and read quadratic)
    val evT = Tables.events(spark, sfDir).select("user_id", "ts", "event_id")
    def sessAt(k: Int): DataFrame = matRead(
      graft.operators.Behavior.sessionize(
        (0 until k).map(j => evT.select((col("user_id") + lit(j * Stride)).as("user_id"),
          col("ts"), col("event_id"))).reduce(_ unionByName _),
        "user_id", "ts", "event_id", 21600000000000L)
        .select("user_id", "session_idx", "session_start", "session_end"),
      s"$scaleDir/sess_k$k")

    val opFilter = sys.env.get("SPARK_GRAFT_SCALE_OPS").map(_.split(",").map(_.trim).toSet)
    val allOps: Seq[(String, Int => Long)] = Seq(
      "dedup_minhash_lsh" -> { k: Int =>
        Dedup.minhashLsh(docsAt(k), "doc_id", "text",
          n = 3, k = 64, bands = 16, threshold = 0.5).count()
      },
      "simhash_cluster_cc" -> { k: Int =>
        val pairs = Dedup.simhashPairs(docsAt(k), "doc_id", "text", maxHamming = 3)
        Dedup.connectedComponents(pairs, "doc_id_1", "doc_id_2").count()
      },
      "sim_ivf_quantized" -> { k: Int =>
        val emb = embsAt(k)
        Similarity.ivfQuantizedTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", nCentroids = 8, nProbe = 2, k = 5, refine = 3).count()
      },
      // posting-list + bounded position expansion: the quadratic risk is
      // a Zipf-head gram's df^2 blow-up in the gram join — the salted
      // copies keep cross-copy grams disjoint, so a linear fit here means
      // the per-copy head, not the corpus multiple, is what the join pays
      "dedup_span_coverage" -> { k: Int =>
        Dedup.spanCoverage(docsAt(k), "doc_id", "text", k = 3).count()
      },
      // r15 suffix-array addendum: prefix-doubling construction + LCP
      // walk must stay O(n log n) — the gate measures the exponent
      "suffix_spans" -> { k: Int =>
        graft.operators.SuffixDedup.duplicateSpanCoverage(
          docsAt(k), "doc_id", "text", minTokens = 6).count()
      },
      "graph_triangle_count" -> { k: Int =>
        graft.operators.Triangles.perNodeTriangles(edgesAt(k)).count()
      },
      // candidate generation is the quadratic risk: k-shifted label copies
      // multiply both vocab and query sides k x over a BOUNDED bigram
      // universe and a SHARED type prefix — the two failure modes that
      // sank the classic blockings right here (q-gram prefix filter:
      // alpha 1.7; PassJoin segments: the slot-0 "click-" posting list
      // grows with n, alpha 1.35) — linear only because deletion-variant
      // keys carry the ids' own entropy
      "fuzzy_editdist" -> { k: Int =>
        val (q, v) = labelsAt(k)
        graft.operators.Fuzzy.editDistanceJoin(q, v, "src", "qs", "w", "w", maxDist = 1)
          .count()
      },
      "join_interval_overlap" -> { k: Int =>
        val ses = sessAt(k)
        val probe = ses.filter(col("user_id") < Stride &&
          pmod(col("user_id"), lit(97L)) === 0)
        graft.operators.Relational.intervalOverlapJoin(probe, ses, Seq.empty,
          "session_start", "session_end", 86400000000000L,
          Seq("user_id", "session_idx"))
          .filter(col("user_id") =!= col("r_user_id")).count()
      },
      // r12 pixel family: the quadratic risk is random 64-bit dHash
      // collisions inside the ~21-bit Hamming band chunks (expected
      // candidates ~ n²·3/2^21 — tiny constant, but genuinely n²); the
      // per-row decode constant dominates while that stays true
      "pixel_neardup" -> { k: Int =>
        val media = graft.operators.Multimodal.pixelPngCorpus(docsAt(k), "doc_id")
        graft.operators.Multimodal.pixelPairs(media, maxHamming = 2).count()
      },
      // r13 JPEG addendum: same banded pair machinery, but the per-row
      // constant is the full Huffman+IDCT decode — the gate proves the
      // decode stays a linear scan-side cost and the band join stays
      // collision-bounded with the JPEG fingerprint too
      "jpeg_neardup" -> { k: Int =>
        val media = graft.operators.Multimodal.pixelJpegCorpus(docsAt(k), "doc_id")
        graft.operators.Multimodal.jpegPairs(media, maxHamming = 4).count()
      },
      // r13 GIF addendum: LZW decode + palette luma through the same
      // banded machinery
      "gif_neardup" -> { k: Int =>
        val media = graft.operators.Multimodal.pixelGifCorpus(docsAt(k), "doc_id")
        graft.operators.Multimodal.gifPairs(media, maxHamming = 2).count()
      },
      // r14 WebP addendum: the full VP8L decode (prefix codes, transforms,
      // cache, LZ77) through the same banded machinery — per-row constant
      // is the decode, band join collision-bounded
      "webp_neardup" -> { k: Int =>
        val media = graft.operators.Multimodal.pixelWebpCorpus(docsAt(k), "doc_id")
        graft.operators.Multimodal.webpPairs(media, maxHamming = 2).count()
      },
      // r15 lossy-VP8 addendum: the full intra-keyframe decode (boolean
      // coder, token trees, iDCT, deblocking) through the same banded
      // machinery — per-row constant is the decode
      "webp_lossy_neardup" -> { k: Int =>
        val media = graft.operators.Multimodal.pixelWebpLossyCorpus(docsAt(k), "doc_id")
        graft.operators.Multimodal.webpPairs(media, maxHamming = 6).count()
      },
      // r14 FLAC addendum: the cross-container hash (WAV + native FLAC
      // decode) through the same banded machinery
      "flac_neardup" -> { k: Int =>
        val media = graft.operators.Multimodal.crossAudioCorpus(docsAt(k), "doc_id")
        graft.operators.Multimodal.crossAudioPairs(media, maxHamming = 2).count()
      },
      // r13 audio addendum: the envelope fingerprint through the same
      // banded machinery — per-row constant is the PCM decode + window
      // sums (linear in payload bytes), band join collision-bounded
      "audio_neardup" -> { k: Int =>
        val media = graft.operators.Multimodal.pcmWavCorpus(docsAt(k), "doc_id")
        graft.operators.Multimodal.audioPairs(media, maxHamming = 2).count()
      })
    val ops = allOps.filter { case (n, _) => opFilter.forall(_.contains(n)) }
    require(ops.nonEmpty, s"SPARK_GRAFT_SCALE_OPS matched none of ${allOps.map(_._1)}")

    // pre-write every corpus the selected ops will read, so no timed run
    // (nor the warmup pass) ever pays the one-off materialization
    val opNames = ops.map(_._1).toSet
    ks.foreach { k =>
      if (opNames.exists(Set("dedup_minhash_lsh", "simhash_cluster_cc",
        "dedup_span_coverage"))) docsAt(k)
      if (opNames("sim_ivf_quantized")) embsAt(k)
      if (opNames("graph_triangle_count")) edgesAt(k)
      if (opNames("fuzzy_editdist")) labelsAt(k)
      if (opNames("join_interval_overlap")) sessAt(k)
    }

    // Same per-run isolation as [[Bench]]: the benched ops localCheckpoint
    // heavily (Boundary.Local in minhashLsh/simhashPairs, CC's round state),
    // and those persisted RDD blocks would otherwise pile up across
    // 3 ops x 3 ks x runs in one block manager — late runs then measure
    // EVICTION CHURN, not the operator (the documented 3.8s -> 37s Bench
    // swing; the r7 k=16 probe's 6.0/11.9/7.7 s spread was this artifact).
    // Cleanup sits OUTSIDE the timed region.
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    // one throwaway pass at the smallest k absorbs JVM/codegen warmup
    ops.foreach { case (_, f) => f(ks.head); isolate() }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val results = ops.map { case (name, f) =>
      val perK3 = ks.map { k =>
        // one untimed pass per (op, k): each k reads a DIFFERENT parquet
        // tree, so the k-level first run otherwise pays page-cache/codegen
        // warmup for that file set and the range-based spread_pct reports
        // warmup, not run variance (Bench's cold-run discipline, per k)
        f(k); isolate()
        val times = (0 until runs).map { _ =>
          val t0 = System.nanoTime
          val n = f(k)
          val secs = (System.nanoTime - t0) / 1e9
          System.err.println(f"[scale] $name k=$k rows=$n $secs%.2f s")
          isolate()
          secs
        }
        // run variance rides along in the JSON: an alpha fit over noisy
        // medians is worthless, so the log must show the spread backing it
        val spreadPct = (times.max - times.min) / median(times) * 100.0
        (k, median(times), spreadPct)
      }
      val perK = perK3.map { case (k, med, _) => k -> med }
      // exponent between the top two points — fixed overheads matter least
      // there; alpha over the full span is also reported
      val (kLo, tLo) = perK.head
      val (k1, t1) = perK(perK.size - 2)
      val (k2, t2) = perK.last
      val alphaTop = math.log(t2 / t1) / math.log(k2.toDouble / k1)
      val alphaFull = math.log(t2 / tLo) / math.log(k2.toDouble / kLo)
      (name, perK3, alphaTop, alphaFull)
    }

    // Locale.ROOT: the f interpolator is default-locale-dependent and would
    // emit comma decimals (invalid JSON) under e.g. a de_DE JVM default
    def num(x: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(x))
    val json = results.map { case (name, perK3, aTop, aFull) =>
      val times = perK3.map { case (k, t, _) => s""""$k":${num(t, 3)}""" }.mkString(",")
      val spreads = perK3.map { case (k, _, s) => s""""$k":${num(s, 0)}""" }.mkString(",")
      s""""$name":{$times,"alpha_top":${num(aTop, 2)},"alpha_full":${num(aFull, 2)},"spread_pct":{$spreads}}"""
    }.mkString(",")
    println(s"""{"metric":"scale_probe","sf":"$sfDir","ks":[${ks.mkString(",")}],"runs":$runs,"ops":{$json}}""")
    spark.stop()

    // GATE (round-8 verdict task 3): the alpha fits are an asserted contract,
    // not just a log line. A linear op measures alpha ≈ 1 (sub-linear fixed
    // overhead pulls it down); 1.3 leaves room for VM noise while still
    // failing long before a quadratic regression (alpha → 2). Exceeding the
    // threshold exits nonzero so tools/scale_gate.sh can fail the build.
    val maxAlpha = sys.env.getOrElse("SPARK_GRAFT_SCALE_MAX_ALPHA", "1.3").toDouble
    val offenders = results.collect { case (name, _, aTop, _) if aTop > maxAlpha => (name, aTop) }
    if (offenders.nonEmpty) {
      offenders.foreach { case (n, a) =>
        System.err.println(f"[scale] GATE FAIL: $n alpha_top $a%.2f > $maxAlpha%.2f")
      }
      sys.exit(1)
    }
  }
}
