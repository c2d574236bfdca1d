package graft.operators

import graft.functions.{Text, Vectors}
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines, at four fidelity /
  * cost points. All are DataFrame programs — one or two shuffles each, no
  * driver-side loops — so they scale to a 100 TB `documents` table:
  *
  *  - exact:          1 shuffle (hash groupBy on content)
  *  - fingerprint:    1 shuffle (groupBy on canonical md5)
  *  - ngramJaccard:   blocked self-join (equi keys) + codegen'd set math
  *  - minhashLsh:     shingle -> K minhashes -> B band buckets -> bucket
  *                    equi-join -> verify; the classic MinHash+LSH pipeline
  *  - simhash:        64-bit simhash, banded hamming candidate join
  *  - embeddingNearDup: hyperplane-LSH-bucketed cosine pairs
  */
object Dedup {

  /** Exact dedup: one row per distinct `textCol`, keeping the minimum id as
    * canonical. Groups on the 128-bit md5 digest, NOT the text — at 100 TB
    * that shuffles 16 bytes per row instead of whole documents, and the
    * map-side partial aggregation still collapses local duplicates.
    * (md5 collisions are negligible at any realistic corpus size; swap in
    * a 256-bit `sha2` if the risk budget says otherwise.)
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Ingest-time exact dedup of a (small) new `batch` against a (huge)
    * `corpus`, bloom-prefiltered: returns the batch's within-batch
    * canonical rows whose text does NOT already exist in the corpus —
    * the rows an append-only ingest would actually write.
    *
    * The result is EXACT (identical to a plain anti-join): the bloom only
    * routes. Bloom-negative digests are definite non-members and skip the
    * corpus probe entirely; bloom-positive candidates (true dups + the fpp
    * tail) are confirmed by a real semi-join before the final anti-join.
    *
    * Scale shape — the corpus is never shuffled: one map-side tree-reduced
    * pass builds the bloom (Spark's own runtime-filter aggregate,
    * [[org.apache.spark.sql.graftnative.NativeColumns.bloomFilterAgg]]),
    * and the confirm pass streams the corpus against a BROADCAST of the
    * tiny candidate set. The batch shuffles once, as 16-byte digests.
    * The collected filter rides as a BROADCAST VARIABLE
    * ([[org.apache.spark.sql.graftnative.NativeColumns.mightContainBroadcast]]):
    * bytes move once per executor over the torrent protocol and
    * deserialize once — NOT as a plan literal, which would serialize the
    * whole filter into every task closure and fall over orders of
    * magnitude before the filter itself is too big. Size `numBits` for the
    * corpus cardinality (~9.6 bits/key for 1% fpp); the practical ceiling
    * is executor/driver memory for one filter copy (a few GB) — beyond
    * that, shard the ingest by digest prefix and build per-shard filters.
    */
  def exactIngestBloom(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      expectedItems: Long,
      numBits: Long,
      boundary: Boundary = Boundary.Local): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns
    val corpusDigests = corpus.select(md5(col(textCol)).as("text_md5"))
    val bloom = corpusDigests
      .agg(NativeColumns.bloomFilterAgg(xxhash64(col("text_md5")), expectedItems, numBits))
      .head().getAs[Array[Byte]](0)
    // two consumers (candidate filter + final anti-join): materialize once
    val batchCanon = boundary(batch
      .groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies")))
    if (bloom == null) return batchCanon // empty corpus: everything is new
    val bloomBc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val candidates = batchCanon
      .filter(NativeColumns.mightContainBroadcast(bloomBc, xxhash64(col("text_md5"))))
    val confirmed = corpusDigests
      .join(broadcast(candidates.select("text_md5")), Seq("text_md5"), "left_semi")
      .distinct()
    batchCanon.join(broadcast(confirmed), Seq("text_md5"), "left_anti")
  }

  /** Near-dedup via canonical fingerprint (sorted distinct word set):
    * catches reorderings/duplicated words at exact-dedup cost.
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(Text.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** All same-block pairs with word-`n`-gram Jaccard >= `threshold`.
    * `blockCols` must make pair counts per block tractable (e.g. language);
    * the scale path for unblockable corpora is [[minhashLsh]].
    */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      n: Int,
      threshold: Double): DataFrame = {
    val withShingles = docs
      .select((blockCols.map(col) :+ col(idCol).as("doc_id")) :+
        Text.words(col(textCol)).as("__w"): _*)
      .select((blockCols.map(col) :+ col("doc_id")) :+
        Text.shinglesFromWords(col("__w"), n).as("shingles"): _*)
    val a = withShingles.select(
      blockCols.map(col) ++ Seq(col("doc_id").as("doc_id_1"), col("shingles").as("s1")): _*)
    val b = withShingles.select(
      blockCols.map(col) ++ Seq(col("doc_id").as("doc_id_2"), col("shingles").as("s2")): _*)
    a.join(b, blockCols)
      .filter(col("doc_id_1") < col("doc_id_2"))
      .withColumn("jaccard", Text.jaccard(col("s1"), col("s2")))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_1", "doc_id_2", "jaccard")
  }

  /** EXACT n-gram Jaccard pairs without blocking — the scale path that
    * makes [[ngramJaccard]]'s O(n^2/blocks) product unnecessary: an
    * inverted index (posting list) per shingle generates candidates only
    * for docs that actually SHARE a shingle, and |A ∩ B| falls out of the
    * posting self-join as a count — no pairwise set math until the final
    * cheap division. For `threshold > 0` the result is IDENTICAL to
    * all-pairs Jaccard (a pair sharing no shingle has jaccard 0).
    *
    * Shape: explode distinct shingles -> equi self-join on the shingle ->
    * one groupBy (pair) counting common shingles -> jaccard from the
    * carried set sizes. Cost is sum over shingles of df(g)^2 — governed by
    * the shingle DOCUMENT-FREQUENCY distribution, not corpus size, so the
    * right tool depends on the corpus:
    *  - natural (Zipf-tailed) text: most shingles are rare, posting lists
    *    are short, and `maxDf` prunes the head — this is the scale path;
    *  - dense small-vocabulary corpora (measured on the synthetic testdata:
    *    949 distinct bigrams, avg df 272 of 5k docs — EVERY shingle is a
    *    stop shingle) the posting join degenerates to ~all-pairs and
    *    [[ngramJaccard]]-with-blocks or [[minhashLsh]] wins instead.
    * Stop-shingles with df > `maxDf` can be dropped (off by default =
    * exact): `common` is then undercounted by at most the dropped
    * shingles, so only pairs whose overlap is stop-shingle-dominated can
    * fall below the threshold — the standard posting-list pruning trade.
    */
  def ngramJaccardIndexed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__w"))
      .select(col("doc_id"), Text.shinglesFromWords(col("__w"), n).as("s"))
      .select(col("doc_id"), size(col("s")).as("sz"), explode(col("s")).as("g"))
    val posts =
      if (maxDf == Int.MaxValue) sh
      else {
        val stop = sh.groupBy("g").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select("g")
        sh.join(broadcast(stop), Seq("g"), "left_anti")
      }
    val a = posts.select(col("g"), col("doc_id").as("doc_id_1"), col("sz").as("sz1"))
    val b = posts.select(col("g"), col("doc_id").as("doc_id_2"), col("sz").as("sz2"))
    a.join(b, "g")
      .filter(col("doc_id_1") < col("doc_id_2"))
      .groupBy("doc_id_1", "doc_id_2", "sz1", "sz2")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz1") + col("sz2") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_1", "doc_id_2", "jaccard")
  }

  /** MinHash signatures: K per-permutation minima of
    * `h_k(x) = (a_k * x + b_k) mod p` over hashed word n-gram shingles.
    * `p = 2^31 - 1` keeps every product below 2^62 — no silent long
    * overflow. Docs with fewer than `n` words (no shingles) are dropped —
    * they have no signature (and can never pass a Jaccard > 0 verify).
    * Output: (doc_id, minhash array<long>). See [[minhashSignature]] for
    * the zero-shuffle execution shape.
    */
  private val MinhashPrime = 2147483647L // 2^31 - 1

  /** splitmix64 — deterministic per-permutation coefficient source. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic (a_k, b_k) permutation coefficients — public so an
    * external oracle can recompute the identical signatures.
    */
  def minhashCoefficients(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      (Math.floorMod(mix64(2L * i), MinhashPrime - 1) + 1,
        Math.floorMod(mix64(2L * i + 1), MinhashPrime))
    }

  /** Content-hash choice for the sketch operators (MinHash shingles,
    * SimHash tokens): fast xxhash64 (seed 42, Spark-native) or the
    * md5-hex-prefix hash (`conv(substr(md5(s),1,15),16,10)`) that external
    * SQL engines can recompute. The hashing runs inside the native sketch
    * expressions (MinHash additionally reduces mod p there).
    */
  sealed trait ShingleHash { def md5: Boolean }
  case object XxShingleHash extends ShingleHash { val md5 = false }
  case object Md5ShingleHash extends ShingleHash { val md5 = true }

  /** A signature is a pure per-row function of the shingle set, so it runs
    * as a PROJECTION: shingling, hashing, and all K minima happen inside
    * one native expression over the words array
    * ([[graft.functions.expressions.MinHashWordsSig]]) — zero shuffles, and
    * no higher-order function for Catalyst's CollapseProject to turn
    * quadratic (see the expression's scaladoc for that war story). The
    * previous explode -> groupBy(doc) -> K min-aggregates shape paid a full
    * shuffle of every (doc, shingle-hash) row to re-group row-local data;
    * `min` is commutative so both forms (and the DuckDB oracle) agree
    * bit-for-bit. Docs with no shingles yield a null signature and are
    * dropped, as the explode form did implicitly.
    */
  def minhashSignature(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int,
      shingleHash: ShingleHash = XxShingleHash): DataFrame = {
    val (as, bs) = minhashCoefficients(k).unzip
    docs
      .select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__w"))
      .select(col("doc_id"),
        org.apache.spark.sql.graftnative.NativeColumns
          .minhashWordsSig(col("__w"), n, shingleHash.md5, as, bs, MinhashPrime)
          .as("minhash"))
      .filter(col("minhash").isNotNull)
  }

  /** MinHash + LSH near-dup pairs: signatures banded into `bands` groups of
    * `k/bands` rows; docs sharing any band bucket become candidates
    * (explode -> equi-join on (band, bucket-hash) -> distinct pairs), then
    * candidates are verified with true shingle Jaccard >= `threshold`.
    *
    * Scale: the only shuffles are the bucket groupBy and the verify join —
    * never an all-pairs product. Bucket skew from random collisions is
    * bounded because buckets key on the full band slice, but EXACT
    * duplicates share every band (a 1M-copy boilerplate doc would make a
    * 1M-row bucket in all 16 tables): run [[exact]] first, or set
    * `maxBucket` to deterministically drop over-full buckets (see
    * [[capBuckets]]).
    */
  /** The LSH "index at rest": (doc_id, band, bucket) rows — the banded
    * signature table a pipeline persists so later batches can join against
    * it without re-sketching the corpus (see [[minhashLshIncremental]]).
    */
  def minhashBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int,
      bands: Int,
      shingleHash: ShingleHash = XxShingleHash,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sigs = minhashSignature(docs, idCol, textCol, n, k, shingleHash)
    capBuckets(
      sigs.select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("minhash"), b * rows + 1, lit(rows)), b))))
        .toDF("doc_id", "band", "bucket"),
      maxBucket)
  }

  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      shingleHash: ShingleHash = XxShingleHash,
      maxBucket: Int = Int.MaxValue,
      boundary: Boundary = Boundary.Local): DataFrame = {
    // the bucket index and the candidate set each feed MULTIPLE consumers
    // (x/y sides of the self-join; the verify semi-join + the final pair
    // join). Without a boundary Spark re-derives them per consumer — the
    // signature projection appeared 100+ times in the executed plan and the
    // corpus was re-scanned 40x. The boundary sketches the corpus ONCE;
    // production pipelines persist this same index at rest anyway
    // (see [[minhashLshIncremental]]).
    val banded = boundary(
      minhashBuckets(docs, idCol, textCol, n, k, bands, shingleHash, maxBucket))
    val candidates = boundary(banded
      .as("x")
      .join(banded.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_1"), col("y.doc_id").as("doc_id_2"))
      .distinct())
    // verify only docs that actually appear in a candidate pair: a
    // semi-join restriction before shingling, so the exact-Jaccard stage
    // re-tokenizes O(|candidates|) docs, not the whole corpus twice —
    // at 100 TB the candidate set is orders of magnitude smaller
    val candIds = candidates.select(col("doc_id_1").as("doc_id"))
      .union(candidates.select(col("doc_id_2").as("doc_id")))
      .distinct()
    // boundary again: the shingled candidate frame joins in twice (s1, s2)
    val shingled = boundary(docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), Text.words(col("__t")).as("__w"))
      .select(col("doc_id"), Text.shinglesFromWords(col("__w"), n).as("s")))
    candidates
      .join(shingled.withColumnRenamed("doc_id", "doc_id_1").withColumnRenamed("s", "s1"), "doc_id_1")
      .join(shingled.withColumnRenamed("doc_id", "doc_id_2").withColumnRenamed("s", "s2"), "doc_id_2")
      .withColumn("jaccard", Text.jaccard(col("s1"), col("s2")))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_1", "doc_id_2", "jaccard")
  }

  /** INCREMENTAL near-dup: check a new ingest batch against an existing
    * corpus through its persisted LSH index ([[minhashBuckets]] at rest) —
    * the daily-pipeline form of [[minhashLsh]]. Only the NEW batch is
    * sketched; the corpus contributes its (doc_id, band, bucket) index and
    * is re-read only for the docs that land in a shared bucket (semi-join
    * restricted), so a day's ingest dedups against a 100 TB history
    * without ever re-sketching or re-scanning it. Emits (new_id,
    * corpus_id, jaccard >= threshold); the caller appends the new batch's
    * buckets to the index afterwards (same [[minhashBuckets]] output).
    *
    * Parameters must match the ones the index was built with — a mismatch
    * silently finds nothing (bucket keys from different k/bands never
    * collide meaningfully), so pipelines should store them with the index.
    */
  def minhashLshIncremental(
      newDocs: DataFrame,
      corpusBuckets: DataFrame,
      corpusDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      shingleHash: ShingleHash = XxShingleHash,
      maxBucket: Int = Int.MaxValue,
      boundary: Boundary = Boundary.Local): DataFrame = {
    val newBuckets =
      minhashBuckets(newDocs, idCol, textCol, n, k, bands, shingleHash, maxBucket)
    // candidates feed three consumers (two semi-join restrictions + the
    // final pair join): materialize once — see [[minhashLsh]]
    val candidates = boundary(newBuckets.as("x")
      .join(corpusBuckets.select("doc_id", "band", "bucket").as("y"), Seq("band", "bucket"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("corpus_id"))
      .distinct())
    def shingled(docs: DataFrame, idAs: String, sAs: String) = docs
      .select(col(idCol).as(idAs), col(textCol).as("__t"))
      .join(candidates.select(idAs).distinct(), Seq(idAs), "left_semi")
      .select(col(idAs), Text.shinglesFromWords(Text.words(col("__t")), n).as(sAs))
    candidates
      .join(shingled(newDocs, "new_id", "s1"), "new_id")
      .join(shingled(corpusDocs, "corpus_id", "s2"), "corpus_id")
      .withColumn("jaccard", Text.jaccard(col("s1"), col("s2")))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "corpus_id", "jaccard")
  }

  /** 64-bit SimHash over word tokens: per-bit majority vote of token
    * xxhash64 bits. Near-dup candidates come from chunk banding with the
    * pigeonhole guarantee: the 64 bits are split into `maxHamming + 1`
    * chunks, so any pair with hamming distance <= maxHamming differs in at
    * most maxHamming chunks and MUST share at least one chunk — 100% recall,
    * with an exact hamming verify after the candidate join.
    */
  /** Like [[minhashSignature]], the sketch is a pure per-row function of
    * the token multiset, so it runs as a zero-shuffle projection: all 64
    * vote sums happen inside the native
    * [[graft.functions.expressions.SimHashWords]] pass (vote sums are
    * commutative, so the result is bit-identical to the old
    * explode -> groupBy vote aggregation and to the DuckDB oracle). Docs
    * with no words are dropped (no tokens -> no hash).
    */
  def simhash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokenHash: ShingleHash = XxShingleHash): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__w"))
      .select(col("doc_id"),
        org.apache.spark.sql.graftnative.NativeColumns
          .simhashWords(col("__w"), tokenHash.md5).as("simhash"))
      .filter(col("simhash").isNotNull)

  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      tokenHash: ShingleHash = XxShingleHash,
      boundary: Boundary = Boundary.Local): DataFrame =
    hammingPairs64(simhash(docs, idCol, textCol, tokenHash), "simhash",
      maxHamming, boundary)

  /** All (doc_id_1 < doc_id_2, hamming) pairs within `maxHamming` over ANY
    * 64-bit signature column — the pigeonhole chunk-banding candidate
    * machinery shared by [[simhashPairs]] (token-vote signatures) and
    * [[graft.operators.Multimodal.perceptualPairs]] (payload block
    * hashes): the 64 bits split into `maxHamming + 1` contiguous chunks,
    * so a qualifying pair MUST share at least one chunk — 100% recall,
    * exact `bit_count(xor)` verify after the candidate join.
    *
    * `sigs` must be `(doc_id, <sigCol>: long)`. The boundary materializes
    * the signature table ONCE: both sides of the candidate self-join
    * derive from it, and when the join broadcasts (small/AQE) there is no
    * shuffle exchange to reuse — without it the signature input is
    * derived twice. The frame is id + 8 bytes per doc (~1.5 GB per
    * billion docs), negligible next to the corpus it replaces. The
    * boundary (vs a bare persist) keeps cleanup with the session's
    * ContextCleaner — no block-manager storage pinned for the session
    * lifetime, the same ownership contract as [[minhashLsh]]; registry
    * planViews expose the fully lazy twin.
    */
  def hammingPairs64(
      sigs: DataFrame,
      sigCol: String,
      maxHamming: Int,
      boundary: Boundary = Boundary.Local): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 63]")
    // pigeonhole banding: nChunks = maxHamming + 1 contiguous bit ranges
    val nChunks = maxHamming + 1
    val bounds = (0 to nChunks).map(c => c * 64 / nChunks)
    val sh = boundary(sigs.select(col("doc_id"), col(sigCol).as("__sig")))
    val chunkCols = (0 until nChunks).map { c =>
      val width = bounds(c + 1) - bounds(c)
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      shiftright(col("__sig"), bounds(c)).bitwiseAND(mask)
    }
    val chunked = sh.select(
      col("doc_id"),
      col("__sig"),
      posexplode(array(chunkCols: _*)))
      .toDF("doc_id", "__sig", "chunk", "chunk_val")
    val candidates = chunked
      .as("x")
      .join(chunked.as("y"), Seq("chunk", "chunk_val"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_id_1"),
        col("y.doc_id").as("doc_id_2"),
        col("x.__sig").as("h1"),
        col("y.__sig").as("h2"))
      .distinct()
    candidates
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_id_1", "doc_id_2", "hamming")
  }

  /** INCREMENTAL [[hammingPairs64]]: pair a BATCH of new 64-bit signatures
    * against a persisted corpus signature table — only new×corpus, never
    * corpus×corpus, so a day's media ingest Hamming-checks a 100 TB
    * history by joining 8-byte rows on chunk values ([[minhashLshIncremental]]'s
    * contract for the fingerprint family). Same pigeonhole banding, exact
    * `bit_count(xor)` verify, 100% recall within `maxHamming`. Output
    * `(new_id, corpus_id, hamming)`.
    */
  def hammingPairs64Incremental(
      newSigs: DataFrame,
      corpusSigs: DataFrame,
      sigCol: String,
      maxHamming: Int,
      boundary: Boundary = Boundary.Local): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 63]")
    val nChunks = maxHamming + 1
    val bounds = (0 to nChunks).map(c => c * 64 / nChunks)
    def chunked(df: DataFrame, idAs: String, sigAs: String): DataFrame = {
      val chunkCols = (0 until nChunks).map { c =>
        val width = bounds(c + 1) - bounds(c)
        val mask = if (width >= 64) -1L else (1L << width) - 1L
        shiftright(col(sigAs), bounds(c)).bitwiseAND(mask)
      }
      df.select(col("doc_id").as(idAs), col(sigCol).as(sigAs))
        .select(col(idAs), col(sigAs), posexplode(array(chunkCols: _*)))
        .toDF(idAs, sigAs, "chunk", "chunk_val")
    }
    val candidates = boundary(
      chunked(newSigs, "new_id", "__s1")
        .join(chunked(corpusSigs, "corpus_id", "__s2"), Seq("chunk", "chunk_val"))
        .select("new_id", "corpus_id", "__s1", "__s2")
        .distinct())
    candidates
      .withColumn("hamming", bit_count(col("__s1").bitwiseXOR(col("__s2"))))
      .filter(col("hamming") <= maxHamming)
      .select("new_id", "corpus_id", "hamming")
  }

  /** Train/eval CONTAMINATION detection (decontamination): emit every
    * (train doc, benchmark doc) pair where the train doc's word-`n`-gram
    * set covers at least `minFrac` of the benchmark doc's — the standard
    * "did an eval set leak into the training corpus" check, measured as
    * coverage OF THE BENCHMARK doc (a long train doc that embeds a whole
    * eval question scores 1.0 regardless of its own length).
    *
    * Scale shape: both sides explode to distinct (doc, shingle) postings and
    * equi-join on the shingle. The benchmark side is a FIXED SMALL corpus by
    * nature (eval sets are thousands of docs, training corpora are billions)
    * — it is broadcast, so the 100 TB train side joins map-side with no
    * shuffle of its postings; the only shuffle is the (train, bench) pair
    * aggregation, whose size is bounded by actually-shared shingles, never
    * |train| x |bench|. Stop-shingles that would make every train doc a
    * candidate pair can be pruned upstream with the same `maxDf` trick as
    * [[ngramJaccardIndexed]] — at the default (exact) every shared shingle
    * counts.
    */
  def contamination(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minFrac: Double): DataFrame = {
    def postings(df: DataFrame, idAs: String, szAs: String, gAs: String) = df
      .select(col(idCol).as(idAs), Text.words(col(textCol)).as("__w"))
      .select(col(idAs), Text.shinglesFromWords(col("__w"), n).as("__s"))
      .select(col(idAs), size(col("__s")).cast("long").as(szAs), explode(col("__s")).as(gAs))
    val t = postings(train, "train_id", "train_sz", "g")
    val b = postings(bench, "bench_id", "bench_sz", "g")
    t.join(broadcast(b), "g")
      .groupBy("train_id", "bench_id", "bench_sz")
      .agg(count(lit(1)).as("common"))
      .withColumn("bench_frac",
        col("common").cast("double") / greatest(col("bench_sz"), lit(1L)).cast("double"))
      .filter(col("bench_frac") >= minFrac)
      .select("train_id", "bench_id", "common", "bench_frac")
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv:2303.09540):
    * drop documents whose EMBEDDINGS are near-identical, using k-means
    * cells as the blocking structure — cosine pairs are computed only
    * WITHIN a cell (that intra-cluster restriction is the paper's
    * approximation and what makes the op sub-quadratic: Σ|cell|² instead
    * of n²). Pairs ≥ `tau` resolve through [[connectedComponents]]; each
    * component keeps its minimum id. Output: (vec_id, component, keep) for
    * EVERY input row — singletons keep themselves.
    *
    * Scale shape: centroids are driver-small by construction and inlined
    * as [[Similarity.CentroidLits]] literals (assignment = zero-shuffle
    * projection); the assigned frame is materialized once behind
    * `boundary` and feeds both sides of the intra-cell pair join (an equi
    * join on cell, never a cross product). Degenerate giant cells (a
    * duplicate flood collapsing into one cell) should be capped upstream
    * the way [[minhashLsh]] caps buckets; embedding near-dup with
    * hyperplane banding ([[embeddingNearDup]]) is the alternative blocking
    * when cells skew.
    */
  def semanticDedup(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      tau: Double,
      kmeansIters: Int = 2,
      boundary: Boundary = Boundary.Local): DataFrame = {
    val pairs = semanticPairs(emb, idCol, vecCol, nClusters, tau, kmeansIters, boundary)
    val comp = connectedComponents(pairs, "id1", "id2")
    emb.select(col(idCol).cast("long").as("vec_id"))
      .join(comp.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), col("vec_id")).as("component"),
        (coalesce(col("cluster"), col("vec_id")) === col("vec_id")).as("keep"))
  }

  /** The assignment + intra-cell-pair stage of [[semanticDedup]], exposed
    * separately so plan hygiene can inspect it: the connected-components
    * rounds downstream checkpoint eagerly, which truncates lineage and
    * would hide this plan from any sweep over the final frame.
    */
  def semanticPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      tau: Double,
      kmeansIters: Int = 2,
      boundary: Boundary = Boundary.Local): DataFrame = {
    require(nClusters >= 1 && tau >= -1.0 && tau <= 1.0)
    // centroids inlined as literals (Similarity.CentroidLits): assignment
    // is a pure projection — no BroadcastNestedLoopJoin, no argmax groupBy
    // shuffle; tie rule (cosine DESC, cell_id ASC) identical to the oracle
    val cents = Similarity.collectCentroids(
      Similarity.kmeansCentroids(emb, idCol, vecCol, nClusters, kmeansIters))
    val assigned = boundary(emb.select(
      col(idCol).cast("long").as("vid"),
      col(vecCol).as("v"),
      cents.assign(col(vecCol)).as("cell")))
    assigned.select(col("cell"), col("vid").as("id1"), col("v").as("v1"))
      .join(assigned.select(col("cell"), col("vid").as("id2"), col("v").as("v2")),
        Seq("cell"))
      .filter(col("id1") < col("id2"))
      .filter(Vectors.cosine(col("v1"), col("v2")) >= tau)
      .select("id1", "id2")
  }

  /** SPAN-LEVEL duplicate statistics — the sub-document counterpart of the
    * whole-doc dedup family (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499: repeated SPANS, not
    * just repeated documents, degrade models; boilerplate headers, license
    * blocks and templated text duplicate across otherwise-distinct docs).
    * For each doc: the number of `k`-token windows (with multiplicity —
    * a phrase repeated five times is five windows), how many of those
    * windows also occur in AT LEAST ONE other doc, and the duplicated
    * fraction — the per-doc signal a curation pass thresholds on.
    *
    * Shape at scale (the exact-substring analog of the posting-list
    * Jaccard): one narrow (doc, gram, multiplicity) aggregation, one
    * gram-keyed document-frequency aggregation, one gram-keyed join back —
    * the corpus text crosses the wire once as n-gram postings, there is no
    * pairwise anything, and the final per-doc rollup is map-side
    * combinable. Zipf-head grams make the join key skewed; AQE's skew
    * split (LayoutSpec evidence) or a `maxDf` head-drop upstream handle
    * it — and at k >= 3 the head is already orders of magnitude flatter
    * than unigram df.
    */
  def duplicateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = docs.select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__w"))
    val dg = w
      .select(col("doc_id"), explode(Text.allShinglesFromWords(col("__w"), k)).as("gram"))
      .groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("m"))
    val dfq = dg.groupBy("gram").agg(count(lit(1)).as("df"))
    val nDup = dg.join(dfq, "gram")
      .groupBy("doc_id")
      .agg(sum(when(col("df") >= 2, col("m")).otherwise(0L)).as("n_dup_windows"))
    w.select(col("doc_id"),
        greatest(size(col("__w")) - (k - 1), lit(0)).cast("long").as("n_windows"))
      .join(nDup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        when(col("n_windows") > 0,
          coalesce(col("n_dup_windows"), lit(0L)).cast("double") / col("n_windows").cast("double"))
          .otherwise(lit(0.0)).as("dup_fraction"))
  }

  /** SPAN COVERAGE — the position-level companion of [[duplicateSpans]]:
    * the fraction of a doc's WORD POSITIONS lying inside at least one
    * `k`-token window that also occurs in >= `minDf` docs (the
    * "fraction of characters inside duplicated n-grams" gate of
    * Gopher/RefinedWeb-class cleaning, at word granularity).
    * [[duplicateSpans]] counts duplicated WINDOWS — five overlapping
    * copies of one boilerplate sentence count five times there but cover
    * the same stretch of text once here, so coverage is the honest
    * "how much of this doc is boilerplate" number a strip-or-drop
    * decision wants. Output: (doc_id, word_count, covered_words,
    * coverage_frac, keep = coverage_frac <= maxFrac). Cross-document
    * duplication only (a gram must appear in `minDf` DISTINCT docs);
    * within-doc repetition is [[graft.quality.Scoring.gopherRules]]'
    * signal.
    *
    * Shape at scale: the same posting-list plan as [[duplicateSpans]] —
    * (doc, pos, gram) postings, a gram-keyed distinct-doc df aggregation,
    * one gram-keyed join back (Zipf-head skew: AQE skew split handles it,
    * same note as there) — plus a bounded position expansion (x k) and a
    * per-doc distinct that shuffles (doc, pos) longs only. Text crosses
    * the wire once, nothing is pairwise.
    */
  def spanCoverage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minDf: Int = 2,
      maxFrac: Double = 0.3): DataFrame = {
    require(k >= 1 && minDf >= 2, "need k >= 1 and minDf >= 2")
    val w = docs.select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__w"))
    val pg = w.select(col("doc_id"),
      posexplode(Text.allShinglesFromWords(col("__w"), k)).as(Seq("pos", "gram")))
    val dup = pg.select("gram", "doc_id").distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("gram")
    val covered = pg.join(dup, "gram")
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("covered_words"))
    // null-text docs: words(null) is null, and size(null) is NULL under
    // ANSI but -1 under legacy sizeOfNull (the non-ANSI sessions this
    // engine standardizes on) — an explicit null branch reports 0 either
    // way, like empty-text docs (covered_words and coverage_frac are
    // already 0-coalesced; a null/-1 count with non-null metrics would be
    // an inconsistent shape downstream)
    w.select(col("doc_id"),
        when(col("__w").isNull, lit(0)).otherwise(size(col("__w")))
          .cast("long").as("word_count"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("word_count"),
        coalesce(col("covered_words"), lit(0L)).as("covered_words"),
        when(col("word_count") > 0,
          coalesce(col("covered_words"), lit(0L)).cast("double") /
            col("word_count").cast("double"))
          .otherwise(lit(0.0)).as("coverage_frac"))
      .withColumn("keep", col("coverage_frac") <= maxFrac)
  }

  /** DUPLICATED-SPAN REMOVAL — the EDITING companion of [[spanCoverage]]:
    * instead of scoring a doc by how much of it sits inside cross-document
    * duplicated `k`-grams, EXCISE those positions and return the cleaned
    * text (plus removal accounting). This is the "remove the duplicated
    * substring, keep the rest of the document" step of suffix-array-style
    * training-data dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"), at word-window granularity: every
    * word position covered by a window whose gram occurs in >= `minDf`
    * DISTINCT docs is dropped from EVERY doc — the boilerplate-strip
    * contract (nav bars, license footers, share buttons vanish
    * everywhere). Keeping one canonical copy of near-identical whole docs
    * is the CLUSTER-level job ([[clusterKeepBest]]); this operator edits
    * within docs that otherwise survive.
    *
    * Output: (doc_id, clean_text — remaining words space-joined, null for
    * null-text docs; word_count; n_removed). Within-doc-only repetition
    * (df = 1) is untouched — that is [[graft.quality.Scoring.gopherRules]]'
    * signal.
    *
    * Shape at scale: identical posting-list plan to [[spanCoverage]]
    * (text crosses the wire once as (doc, pos, gram) postings; nothing
    * pairwise) plus ONE extra join carrying each doc's covered-position
    * set (bounded by doc length) back onto its words array; the excision
    * itself is a per-row indexed-filter projection.
    */
  def spanRemoval(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minDf: Int = 2): DataFrame = {
    require(k >= 1 && minDf >= 2, "need k >= 1 and minDf >= 2")
    val w = docs.select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__w"))
    val pg = w.select(col("doc_id"),
      posexplode(Text.allShinglesFromWords(col("__w"), k)).as(Seq("pos", "gram")))
    val dup = pg.select("gram", "doc_id").distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("gram")
    val covered = pg.join(dup, "gram")
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .distinct()
      .groupBy("doc_id").agg(collect_set("p").as("__cov"))
    w.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("__w"),
        coalesce(col("__cov"), array().cast("array<int>")).as("__cov"))
      .select(col("doc_id"),
        filter(col("__w"), (word, i) =>
          !array_contains(col("__cov"), i.cast("int"))).as("__kept"),
        // size(null) is -1 under legacy sizeOfNull: explicit null branch
        when(col("__w").isNull, lit(0)).otherwise(size(col("__w")))
          .cast("long").as("word_count"),
        size(col("__cov")).cast("long").as("n_removed"))
      .select(col("doc_id"),
        array_join(col("__kept"), " ").as("clean_text"),
        col("word_count"), col("n_removed"))
  }

  /** CORPUS SNAPSHOT DIFF: classify every doc id across two corpus
    * versions as added / removed / changed / unchanged — the versioning
    * primitive behind incremental reprocessing (only `added`+`changed`
    * flow into the next pipeline run) and audit trails. Content equality
    * is by md5 digest, so the full-outer join carries 16-byte digests,
    * never document text — at 100 TB the diff shuffles ids + digests only.
    */
  def corpusDiff(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def digests(df: DataFrame, dAs: String) = df
      .select(col(idCol).as("doc_id"), md5(col(textCol)).as(dAs))
    digests(oldDocs, "__old")
      .join(digests(newDocs, "__new"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(col("__old") === col("__new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Resolve near-dup PAIRS into CLUSTER assignments: every node of the
    * pair graph gets the MINIMUM doc id reachable from it (its connected
    * component's canonical representative), so the corpus dedupes by
    * keeping rows where `doc_id == cluster`. Output: (node, cluster) for
    * every node that appears in a pair; singletons (docs in no pair) are
    * absent — callers left-join and coalesce to themselves.
    *
    * Algorithm: MULTILEVEL iterated MIN-CONTRACTION with an ADAPTIVE
    * pointer chase. Each distributed round computes `m(u) = min(u, min
    * neighbor)` on the current (contracted) graph — one map-side-
    * combinable groupBy — then rewrites every edge to `(m(u), m(v))`,
    * dropping self-loops. On typical LSH pair graphs (small stars and
    * near-cliques) that ONE-HOP contraction collapses components in 1-2
    * rounds and costs exactly one aggregation + one edge rewrite per
    * round. The adversarial case is a monotone chain (0-1-2-...-n:
    * m(i) = i-1 removes a single node per round — O(n) rounds). The
    * guard is adaptive: whenever a round's edge-shrink ratio STALLS
    * (< 2×), every later round first POINTER-DOUBLES m to its fixpoint
    * m* (each node chased to its local minimum; O(log chain) self-joins
    * on the n-row pointer table, never on edges) before contracting.
    * Chased rounds contract to the LOCAL MINIMA of the round's graph,
    * and no two local minima are adjacent, so every path shrinks by at
    * least half per chased round — O(log n) rounds worst-case, while
    * the typical case never pays a single chase job (round-8 change; the
    * always-chase form cost ~30% on sf0.1 cluster assignment). Rounds
    * run only while the edge set exceeds `localSolveEdges`; the
    * contracted remainder — provably at most that many rows — is then
    * solved EXACTLY on the driver with union-find (O(E α(E)), ~16
    * bytes/edge collected) and the component-minimum map joins back as a
    * broadcast. That final step is the standard coarsest-level solve of
    * multilevel graph algorithms: at 100 TB, LSH-sparse pair graphs
    * contract below a million edges in a couple of shuffles, and every
    * further round a pure-distributed fixpoint would run (each a full
    * shuffle + materialization over a now-tiny frame) is replaced by one
    * collect. `localSolveEdges = 0` forces the pure-distributed
    * fixpoint. `localCheckpoint` truncates the per-round lineage (a
    * cluster deployment with flaky executors would set a checkpoint dir
    * and use `checkpoint` instead). All reductions are `min` and union-find
    * representatives are normalized to component minima — fully
    * deterministic, any partitioning.
    *
    * A FAST PATH short-circuits the whole machinery when the input edge
    * list itself already fits the `localSolveEdges` budget (one
    * limit-guarded collect, then the same driver union-find) — the common
    * case for LSH pair graphs, whose edge count is orders of magnitude
    * below their corpus row count.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 25,
      localSolveEdges: Long = 1L << 20,
      labelCheckpointEvery: Int = 8): DataFrame =
    connectedComponentsStats(pairs, aCol, bCol, maxIters, localSolveEdges,
      labelCheckpointEvery).labels

  /** INCREMENTAL cluster resolution: extend an existing `(node, cluster)`
    * assignment with a batch of NEW pairs — the daily companion of
    * [[minhashLshIncremental]] / [[graft.streaming.Streams
    * .lshDedupAvailableNow]]: yesterday's assignment is the at-rest
    * state, today's pair batch is small, and recomputing CC over the full
    * historical edge set would rescan a corpus-sized graph for nothing.
    *
    * The assignment itself IS a star graph (every member points at its
    * min-id label), and a star preserves its component's connectivity
    * exactly — so CC over (star edges ∪ new pairs) equals the full
    * recompute over (all historical edges ∪ new pairs), with the same
    * min-id labels: new pairs can only MERGE components, and the merged
    * minimum is the minimum over the united member sets either way.
    * Differentially property-tested against the from-scratch run
    * (DedupSpec). The CC input is |assigned nodes| + |new pairs| rows,
    * independent of how many historical edges produced the assignment.
    *
    * Output: fresh `(node, cluster)` for every node in either input.
    * Like [[connectedComponents]], nodes appearing in NO edge (singleton
    * docs never paired) are absent — callers coalesce to the id.
    */
  def connectedComponentsIncremental(
      assignment: DataFrame,
      newPairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 25,
      localSolveEdges: Long = 1L << 20,
      labelCheckpointEvery: Int = 8): DataFrame = {
    val star = assignment
      .select(col("node").cast("long").as("a"), col("cluster").cast("long").as("b"))
      .filter(col("a") =!= col("b")) // the label's own row adds nothing
    val edges = star.unionByName(newPairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b")))
    connectedComponents(edges, "a", "b", maxIters, localSolveEdges,
      labelCheckpointEvery)
  }

  /** Round-count telemetry from a [[connectedComponents]] run — lets tests
    * assert the STRUCTURAL O(log n) bound (rounds, not wall-clock, which
    * flakes on loaded machines) and callers log contraction behavior.
    */
  final case class CcStats(labels: DataFrame, rounds: Int, chasedRounds: Int)

  /** [[connectedComponents]] plus telemetry; see that method for the
    * algorithm. Kept package-visible — the stable public surface is the
    * labels frame.
    */
  private[graft] def connectedComponentsStats(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 25,
      localSolveEdges: Long = 1L << 20,
      labelCheckpointEvery: Int = 8): CcStats = {
    require(labelCheckpointEvery > 0)
    val half = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
    // FAST PATH (round 8): LSH pair graphs are tiny relative to the corpora
    // they come from — at sf0.1 a 5k-doc corpus yields ~500 pairs, and even
    // at 100 TB a well-tuned banding emits edges in the millions, under the
    // default bound. Probe with ONE limit-guarded job: if the whole
    // undirected edge list fits in `localSolveEdges` rows it is ALREADY the
    // coarsest level — union-find it on the driver directly and skip the
    // doubled-edge checkpoint, the node-set distinct, and the edge count
    // (three jobs the distributed path pays before round 1). The collect is
    // bounded by localSolveEdges + 1 rows of two longs, the same budget the
    // coarsest-level solve always had. `localSolveEdges = 0` still forces
    // the pure-distributed fixpoint whenever any edge exists.
    if (localSolveEdges < Int.MaxValue - 1) {
      val probe = half.limit(localSolveEdges.toInt + 1)
        .as[(Long, Long)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
        .collect()
      if (probe.length <= localSolveEdges) {
        val all = unionFindComponentMin(probe).toSeq
        val spark = pairs.sparkSession
        val df =
          if (all.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("node", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("cluster", org.apache.spark.sql.types.LongType))))
          else spark.createDataFrame(all).toDF("node", "cluster")
        return CcStats(df, 0, 0)
      }
    }
    var edges = half.union(half.select(col("v").as("u"), col("u").as("v"))).localCheckpoint()
    var labels = edges.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("cluster")).localCheckpoint()
    var nEdges = edges.count()
    var iter = 0
    var chase = false // sticky: flips on at the first stalled round
    var chasedRounds = 0
    while (nEdges > localSolveEdges && iter < maxIters) {
      val m1 = edges.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
        .localCheckpoint()
      // Chase only once shrink has stalled (see Scaladoc): pointer-double
      // m to its fixpoint — each doubling step squares the pointer
      // (p <- p(p)) on the n-row pointer table, never on edges.
      var m = m1
      if (chase) {
        chasedRounds += 1
        var hops = 0
        var changed = 1L
        while (changed > 0 && hops < 40) {
          val j = m.as("a").join(m.as("b"), col("a.m") === col("b.u"))
            .select(col("a.u").as("u"), (col("a.m") =!= col("b.m")).as("ch"),
              col("b.m").as("m"))
            .localCheckpoint()
          changed = j.filter(col("ch")).count()
          m = j.select("u", "m")
          hops += 1
        }
        require(changed == 0, s"pointer chase did not fix in $hops doublings")
      }
      val contracted = edges.join(m, "u")
        .select(col("m").as("cu"), col("v"))
        .join(m.select(col("u").as("v"), col("m").as("cv")), "v")
        .select(col("cu").as("u"), col("cv").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      // compose: a label not in m belongs to a component that already
      // fully contracted (no edges left) — it is final, keep it. The
      // chain is LINEAR over the (already materialized) per-round m
      // tables and bounded by maxIters joins; checkpoint every
      // `labelCheckpointEvery` rounds so adversarial-depth runs keep a
      // flat analyzed plan while typical 1-3 round runs never pay the
      // extra job.
      labels = labels.join(m.select(col("u").as("cluster"), col("m")), Seq("cluster"), "left")
        .select(col("node"), coalesce(col("m"), col("cluster")).as("cluster"))
      if ((iter + 1) % labelCheckpointEvery == 0) labels = labels.localCheckpoint()
      edges = contracted
      val prevEdges = nEdges
      nEdges = edges.count()
      // Stall detection: a healthy contraction at least halves the edge
      // set. Anything less means chain-like structure the one-hop form
      // would grind through linearly — switch the chase on for all
      // remaining rounds (2 * nEdges > prevEdges <=> shrink ratio < 2).
      if (!chase && nEdges > localSolveEdges && 2 * nEdges > prevEdges) chase = true
      iter += 1
    }
    require(nEdges <= localSolveEdges,
      s"connectedComponents did not contract below $localSolveEdges edges in $maxIters rounds")
    if (nEdges > 0) {
      // Coarsest-level solve: the loop guard bounds the collect at
      // localSolveEdges rows of two longs. Union-find with path
      // compression, then representatives normalized to the component
      // MINIMUM so the result is independent of edge visit order.
      val remaining = edges.select(col("u"), col("v"))
        .as[(Long, Long)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
        .collect()
      val mapping = unionFindComponentMin(remaining)
        .toSeq.filter { case (n, mn) => n != mn }
      val spark = pairs.sparkSession
      val mapDf = spark.createDataFrame(mapping).toDF("cluster", "m")
      labels = labels.join(broadcast(mapDf), Seq("cluster"), "left")
        .select(col("node"), coalesce(col("m"), col("cluster")).as("cluster"))
    }
    CcStats(labels, iter, chasedRounds)
  }

  /** Driver-side union-find over an edge array: every node that appears in
    * an edge maps to its component MINIMUM (identity entries included).
    * Iterative find + full path compression — adversarially-ordered chains
    * can reach the edge bound in length, far past any stack. Deterministic
    * for any edge order. Shared by the [[connectedComponentsStats]] fast
    * path and its coarsest-level solve.
    */
  private def unionFindComponentMin(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.groupBy(find)
      .flatMap { case (_, ns) => val mn = ns.min; ns.map(_ -> mn) }
      .toMap
  }

  /** Keep only (band, bucket) groups of at most `cap` members — one
    * map-side-combined count aggregation over narrow (band, bucket) keys
    * plus a broadcast-able semi-join of the small oversized-keys set
    * (at a sane cap almost no buckets exceed it). No-op at Int.MaxValue.
    */
  private[operators] def capBuckets(bucketed: DataFrame, cap: Int): DataFrame =
    if (cap == Int.MaxValue) bucketed
    else {
      val oversized = bucketed.groupBy("band", "bucket")
        .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
        .select("band", "bucket")
      bucketed.join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
    }

  /** Embedding near-dup pairs: BANDED hyperplane LSH (OR of `bands`
    * independent hash tables of `planesPerBand` sign bits each), then exact
    * cosine >= `threshold` on the distinct candidate set.
    *
    * Scale: a single hash table forces an impossible trade — few planes
    * means huge buckets (the bucket self-join degenerates toward O(n^2)),
    * many planes collapses recall (AND-only). Banding decouples them:
    * per-band buckets hold ~n / 2^planesPerBand rows (keep planesPerBand
    * high enough that the bucket join stays linear-ish), while recall is
    * recovered by OR-ing the `bands` tables — the same construction
    * [[minhashLsh]] uses. Candidates are deduped on the 2-id pair BEFORE
    * vectors are re-joined for the exact verify, so the wide embedding rows
    * never ride through the distinct shuffle.
    *
    * An over-full (band, bucket) group — a degenerate region of the
    * embedding space, e.g. a spam cluster or all-zero vectors — would pay
    * O(size^2) in the self-join; `maxBucket` (off by default) drops those
    * whole groups deterministically (the pair either IS or is not emitted —
    * no sampling), bounding per-bucket work at the cost of recall inside
    * the dropped region, where near-dups are better handled by exact dedup.
    */
  def embeddingNearDup(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      bands: Int,
      planesPerBand: Int,
      threshold: Double,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val base = emb.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val bucketed = capBuckets(
      base.select(
        col("vec_id"),
        posexplode(Vectors.bandedBuckets(col("v"), bands, planesPerBand)))
        .toDF("vec_id", "band", "bucket"),
      maxBucket)
    val candidates = bucketed
      .as("x")
      .join(bucketed.as("y"), Seq("band", "bucket"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id_1"), col("y.vec_id").as("vec_id_2"))
      .distinct()
    candidates
      .join(base.select(col("vec_id").as("vec_id_1"), col("v").as("v1")), "vec_id_1")
      .join(base.select(col("vec_id").as("vec_id_2"), col("v").as("v2")), "vec_id_2")
      .withColumn("cosine", Vectors.cosine(col("v1"), col("v2")))
      .filter(col("cosine") >= threshold)
      .select("vec_id_1", "vec_id_2", "cosine")
  }

  /** N-gram CONTAINMENT pairs over the same inverted index as
    * [[ngramJaccardIndexed]] — the asymmetric near-dup Jaccard cannot see:
    * a short document quoted inside a long one has tiny Jaccard (the union
    * is dominated by the long doc) but containment
    * `|A∩B| / min(|A|,|B|)` ≈ 1 (Broder's containment, the
    * excerpt/quotation/boilerplate-inclusion detector every crawl dedup
    * needs beside symmetric near-dup).
    *
    * Emits `(doc_id_1 < doc_id_2, common, sz1, sz2, containment)` for
    * pairs whose max-containment (smaller side contained in the other)
    * meets `threshold` — one double division of exact longs. Identical
    * posting-list shape, Σdf² bound, and `maxDf` pruning trade as
    * [[ngramJaccardIndexed]].
    */
  def ngramContainmentIndexed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__w"))
      .select(col("doc_id"), Text.shinglesFromWords(col("__w"), n).as("s"))
      .select(col("doc_id"), size(col("s")).cast("long").as("sz"), explode(col("s")).as("g"))
    val posts =
      if (maxDf == Int.MaxValue) sh
      else {
        val stop = sh.groupBy("g").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select("g")
        sh.join(broadcast(stop), Seq("g"), "left_anti")
      }
    val a = posts.select(col("g"), col("doc_id").as("doc_id_1"), col("sz").as("sz1"))
    val b = posts.select(col("g"), col("doc_id").as("doc_id_2"), col("sz").as("sz2"))
    a.join(b, "g")
      .filter(col("doc_id_1") < col("doc_id_2"))
      .groupBy("doc_id_1", "doc_id_2", "sz1", "sz2")
      .agg(count(lit(1)).as("common"))
      .withColumn("containment",
        col("common").cast("double") / least(col("sz1"), col("sz2")).cast("double"))
      .filter(col("containment") >= threshold)
      .select("doc_id_1", "doc_id_2", "common", "sz1", "sz2", "containment")
  }

  /** Split-leakage audit: how many near-duplicate pairs STRADDLE a
    * train/validation split — the eval-contamination number a
    * training-data pipeline must drive to zero (a doc-keyed hash split
    * puts ~2·p·(1-p) of duplicate pairs across the boundary; the
    * cluster-keyed split [[graft.quality]] uses is leak-free by
    * construction, and this report PROVES it on the actual data instead
    * of by argument). One row: `(n_pairs, n_cross, leak_rate)`; inputs
    * are the duplicate pair set (any `*Pairs` operator here) and a
    * `(doc_id, split)` assignment. Two keyed joins of the (tiny) pair
    * set against the assignment + one aggregate.
    */
  def splitLeakageReport(pairs: DataFrame, assignment: DataFrame): DataFrame =
    pairs.select("doc_id_1", "doc_id_2")
      .join(assignment.select(col("doc_id").as("doc_id_1"), col("split").as("__s1")),
        "doc_id_1")
      .join(assignment.select(col("doc_id").as("doc_id_2"), col("split").as("__s2")),
        "doc_id_2")
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("__s1") =!= col("__s2"), lit(1))).as("n_cross"))
      .select(col("n_pairs"), col("n_cross"),
        when(col("n_pairs") > 0,
          col("n_cross").cast("double") / col("n_pairs").cast("double")).as("leak_rate"))

  /** Pair-set quality report: precision/recall of an approximate duplicate
    * pair set (banded LSH, simhash, embedding buckets …) against an exact
    * ground truth — the eval loop that decides a banding/threshold
    * trade-off, as a first-class hash-checked operator (the
    * [[graft.operators.Similarity.annRecall]] discipline applied to
    * dedup). Both inputs need `(doc_id_1, doc_id_2)` with the engine's
    * id_1 < id_2 pair convention.
    *
    * One row: `(n_truth, n_approx, n_hit, recall, precision)` — counts are
    * exact longs from one full-outer join of the two (already tiny
    * relative to any corpus) pair sets; each ratio is one double division
    * of exact longs, null when its denominator is zero.
    */
  def pairSetReport(truth: DataFrame, approx: DataFrame): DataFrame = {
    val t = truth.select(col("doc_id_1"), col("doc_id_2")).withColumn("__t", lit(1L))
    val a = approx.select(col("doc_id_1"), col("doc_id_2")).withColumn("__a", lit(1L))
    t.join(a, Seq("doc_id_1", "doc_id_2"), "full_outer")
      .agg(
        count(col("__t")).as("n_truth"),
        count(col("__a")).as("n_approx"),
        count(when(col("__t").isNotNull && col("__a").isNotNull, lit(1))).as("n_hit"))
      .select(col("n_truth"), col("n_approx"), col("n_hit"),
        when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth").cast("double")).as("recall"),
        when(col("n_approx") > 0,
          col("n_hit").cast("double") / col("n_approx").cast("double")).as("precision"))
  }
}
