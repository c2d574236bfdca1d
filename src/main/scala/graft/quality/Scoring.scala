package graft.quality

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics document scoring: signals that need a pass over the
  * whole corpus (not just the row), distilled to a small broadcastable
  * model — the "train a tiny model, score every doc" shape of LLM-pipeline
  * quality filters.
  */
object Scoring {

  /** Default ceiling on the vocabulary rows a scoring join will broadcast:
    * 1M (word, count) rows is tens of MB — inside every practical
    * driver/executor broadcast budget ([[graft.features.Encoders
    * .DefaultMaxBroadcastGroups]] is the same figure for the same reason).
    * A web-scale corpus vocabulary runs to tens of millions of rows —
    * multi-GB as a broadcast — so past the bound the model side
    * shuffle-joins instead, with identical results.
    */
  val DefaultMaxBroadcastVocab: Long = 1000000L

  /** Unigram-LM surprisal per document: the mean of `-log2 p(w)` over the
    * doc's tokens, where `p` is the corpus unigram distribution — the
    * classic perplexity-proxy quality signal (high = unusual vocabulary,
    * low = boilerplate). Output: (doc_id, surprisal, n_tokens); docs with
    * no tokens are absent.
    *
    * Shape at scale: one narrow (word, count) aggregation builds the
    * "model"; the corpus total comes back as a two-phase scalar literal
    * (one tiny job, like the watermark read — no 1-row cross join in the
    * plan); the vocabulary — orders of magnitude smaller than the corpus —
    * broadcasts into the scoring join, so the token stream is never
    * shuffled; the per-doc mean is one map-side-combinable aggregation.
    *
    * Determinism: the log2 terms are quantized to decimal(38,3) before the
    * order-independent exact decimal sum (the [[graft.functions.Scalars.davg]]
    * pattern). Unlike add/multiply/divide/sqrt, `log2` is not
    * IEEE-correctly-rounded, so
    * engines may differ in the last ulp — the 1e-3 quantization puts the
    * agreement boundary ~1e13 ulps wide, far beyond any libm divergence,
    * while 3 decimals is ample resolution for a quality score.
    */
  /** MIXTURE RESAMPLING: downsample each stratum (language, source, ...) so
    * the kept corpus matches `targetWeights` by token share — the data-mixing
    * step between cleaning and packing. The achievable budget is
    * `B = min_s(T_s / w_s)` (the largest corpus the weights permit with NO
    * upsampling: the scarcest stratum is kept whole); each stratum then
    * keeps `rate_s = w_s * B / T_s` of its tokens via the deterministic
    * key-hash rule of [[Selection.hashSample]] (reproducible across runs,
    * engines, and partitionings; rates apply to docs as atomic units, the
    * standard approximation).
    *
    * Shape: one narrow per-stratum token aggregation, a two-phase scalar
    * for B (tiny job -> literal, like the watermark read), and a broadcast
    * of the |strata|-row rate table back onto the corpus — the scan itself
    * is one pass, never shuffled.
    */
  def mixtureResample(
      docs: DataFrame,
      strataCol: String,
      idCol: String,
      tokenCol: String,
      targetWeights: Map[String, Double],
      salt: String = ""): DataFrame = {
    require(targetWeights.values.forall(_ > 0), "weights must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = targetWeights.toSeq.sortBy(_._1).toDF(strataCol, "__wt")
    val totals = docs.groupBy(strataCol).agg(sum(col(tokenCol)).as("__T"))
      .join(broadcast(weights), strataCol) // strata without a weight drop out
    val bRow = totals
      .agg(min(col("__T").cast("double") / col("__wt"))).head()
    // empty corpus (or no stratum carrying a weight): the achievable
    // budget is zero — keep nothing, same schema AND column order as the
    // non-empty path (which re-selects docs' own order below)
    if (bRow.isNullAt(0)) return docs.limit(0)
    val b = bRow.getDouble(0)
    val rates = totals.select(col(strataCol),
      (col("__wt") * lit(b) / col("__T").cast("double")).as("__rate"))
    docs
      .join(broadcast(rates), strataCol)
      .filter(
        pmod(Text.md5Hash64(concat(col(idCol).cast("string"), lit(salt))), lit(10000)) <
          floor(col("__rate") * 10000.0 + 0.5))
      // the USING join moved strataCol first — restore docs' column order
      // so both return paths (and any positional caller) agree
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** TEMPERATURE-BASED mixture reweighting — the standard multilingual /
    * multi-source rebalancing rule (the `p^alpha` sampling of
    * XLM/mT5/LLaMA-class data recipes): target weight of stratum `s` is
    * `T_s^alpha` for observed token total `T_s`, so `alpha = 1`
    * reproduces the natural distribution, `alpha = 0` weights every
    * stratum equally, and intermediate values up-sample the tail without
    * letting the head drown it. Weights feed [[mixtureResample]]
    * UN-normalized — its rate formula `rate_s = w_s * B / T_s` with
    * `B = min(T_s / w_s)` is invariant under scaling every weight by a
    * constant, and skipping the normalizing sum keeps the whole
    * computation free of order-dependent float accumulation (the
    * differential registry row runs `alpha = 0.5`, where `T^alpha` is the
    * IEEE-correctly-rounded `sqrt` on both engines; other alphas go
    * through `pow`, which is NOT correctly-rounded everywhere — fine in
    * production, excluded from the hash-compared oracle).
    *
    * Two-phase shape: one tiny per-stratum aggregation collects to the
    * driver (<= |strata| rows — the model), then [[mixtureResample]]'s
    * single broadcast-join pass over the corpus.
    */
  def mixtureTemperature(
      docs: DataFrame,
      strataCol: String,
      idCol: String,
      tokenCol: String,
      alpha: Double,
      salt: String = ""): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    val totals = docs.groupBy(strataCol).agg(sum(col(tokenCol)).as("T"))
      .filter(col("T").isNotNull && col("T") > 0)
      .collect()
      .map(r => r.get(0).toString -> r.getLong(1))
    if (totals.isEmpty) return docs.limit(0)
    val weights = totals.map { case (s, t) =>
      s -> (if (alpha == 0.5) math.sqrt(t.toDouble) else math.pow(t.toDouble, alpha))
    }.toMap
    mixtureResample(docs, strataCol, idCol, tokenCol, weights, salt)
  }

  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
      maxBroadcastVocab: Long = DefaultMaxBroadcastVocab): DataFrame = {
    require(maxBroadcastVocab >= 1, "maxBroadcastVocab must be >= 1")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(Text.words(col(textCol))).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    // empty corpus: SUM is null — the scoring join below is empty anyway,
    // the 0 literal just keeps the two-phase read total (no NPE). The
    // vocabulary cardinality (the broadcast guard) rides the same action —
    // zero extra corpus passes, like [[bigramSurprisal]]'s guard.
    val totalRow = vocab.agg(sum("cnt"), count(lit(1))).head()
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val vocabSide =
      if (totalRow.getLong(1) <= maxBroadcastVocab) broadcast(vocab) else vocab
    toks
      .join(vocabSide, "w")
      .withColumn("t", -log2(col("cnt").cast("double") / lit(total).cast("double")))
      .groupBy("doc_id")
      .agg(
        (sum(col("t").cast("decimal(38,3)")).cast("double") / count(lit(1)))
          .as("surprisal"),
        count(lit(1)).as("n_tokens"))
  }

  /** TF-IDF top-`k` terms per document — keyword extraction / topic
    * signature for corpus curation. Output: (doc_id, w, tf, df, score,
    * rank), rank 1..k by descending score, ties to the
    * lexicographically-first word.
    *
    * Determinism: the score is fully INTEGER —
    * `tf * floor(log2(N / df) * 1e6)` — so the only transcendental term is
    * quantized away ([[unigramSurprisal]]'s idiom, here with zero residual
    * float arithmetic: the ranking compares exact longs on every engine).
    *
    * RESIDUAL ASSUMPTION (shared by every `floor(log2(x) * 1e6)` site,
    * including [[graft.quality.Selection.weightedSample]]): quantization
    * removes cross-engine risk only while both engines' log2 land in the
    * same 1e-6 cell. log2 is not IEEE-correctly-rounded, so two libms may
    * differ by ~1 ulp; a value sitting within a ulp of an exact multiple
    * of 1e-6 could floor differently. The inputs here are ratios of small
    * integers (N/df; the dyadic (h+1)/2^20 in weightedSample), whose log2
    * is irrational except at exact powers of two — where log2 IS exact in
    * every conforming libm — so a boundary landing requires an
    * astronomically unlucky irrational within ~1e-16 of a 1e-6 multiple.
    * Empirically zero hits across both SF sweeps every round; if an input
    * family with adversarial values appears, switch the idf to a provably
    * exact integer form (e.g. bit-length floor(log2) on integers).
    *
    * Shape at scale: one (doc, word) aggregation (narrow rows, map-side
    * combined), one word-keyed df aggregation whose result — vocabulary-
    * sized, orders of magnitude smaller than the corpus — broadcasts back
    * (beyond broadcastable vocabulary, swap for a shuffle join on `w`),
    * N as a two-phase scalar literal, and the per-doc top-k as a window
    * over doc-sized groups — no global sort anywhere.
    */
  def tfidfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      boundary: graft.operators.Boundary = graft.operators.Boundary.Local): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // tf feeds THREE consumers (df aggregation, N scalar, the scoring join)
    // — materialize it once; and hash-partition the token stream by doc_id
    // ALONE so the (doc_id, w) aggregation and the final per-doc window
    // both run on that single exchange (a doc's tokens are colocated ⇒ so
    // are its (doc_id, w) groups ⇒ so is its window partition)
    val tf = boundary(docs
      .select(col(idCol).as("doc_id"), explode(Text.words(col(textCol))).as("w"))
      .repartition(col("doc_id"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = tf.select("doc_id").distinct().count()
    val qidf = floor(log2(lit(nDocs.toDouble) / col("df").cast("double")) * 1e6).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("w").asc)
    tf.join(broadcast(dfreq), "w")
      .withColumn("score", col("tf") * qidf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "w", "tf", "df", "score", "rank")
  }

  /** BM25 RANKED RETRIEVAL — query-driven top-k over the corpus, the
    * data-curation primitive [[tfidfTopTerms]] (per-doc keywords) does not
    * cover: "find the documents most relevant to these probe queries"
    * (contamination sweeps, targeted subset mining, eval-set neighbor
    * audits). Okapi BM25 with the Lucene idf (always positive) and
    * k1 = 6/5, b = 3/4 — chosen RATIONAL so the whole score is exact
    * integer arithmetic:
    *
    *   idf_q(t) = floor(log2((2N+2)/(2df+1)) * 1e6)   (the one quantized
    *              transcendental — [[tfidfTopTerms]]'s residual-assumption
    *              note applies verbatim)
    *   contrib  = floor(idf_q * 22*T*tf / (10*T*tf + 3*T + 9*dl*N))
    *
    * where the saturation term (k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl))
    * with avgdl = T/N clears denominators by ×10T: 22*T*tf over
    * 10*T*tf + 3*T + 9*dl*N. Products stay inside a long for
    * T ≲ 4e14 tokens × tf ≲ 1e3 (the idf product is widened through
    * decimal(38,0)), and the bound is ENFORCED: the measured
    * totTok/nDocs/maxTf/maxDl are validated up front so an oversized
    * corpus fails loudly instead of wrapping under non-ANSI arithmetic.
    * The per-term floor makes contributions — and their exact long sums —
    * bit-identical on every engine.
    *
    * Scale shape: the inverted index is the (doc_id, w, tf) aggregation
    * (doc-partitioned once, shared with dl); df broadcasts as vocabulary
    * state; the QUERY side broadcasts too — the probe-side-small contract
    * ([[graft.operators.Similarity]]'s): queries are a curated probe set,
    * not the corpus — so posting lists are never shuffled, only the
    * (qid, doc) contributions (bounded by the probes' posting mass).
    * Per-query ranking is the map-side-bounded k-heap, ties to the lower
    * doc_id. Queries whose terms all miss the corpus emit no rows.
    */
  def bm25Retrieve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qidCol: String,
      qtextCol: String,
      k: Int,
      boundary: graft.operators.Boundary = graft.operators.Boundary.Local): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.graftnative.NativeColumns
    val toks = boundary(docs
      .select(col(idCol).as("doc_id"), explode(Text.words(col(textCol))).as("w"))
      .repartition(col("doc_id"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf")))
    val dl = toks.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
    // two-phase scalars (the snk_range_clustered literal discipline)
    val totals = toks.agg(countDistinct(col("doc_id")), coalesce(sum("tf"), lit(0L)),
      coalesce(max("tf"), lit(0L))).head()
    val nDocs = totals.getLong(0)
    val totTok = totals.getLong(1)
    val maxTf = totals.getLong(2)
    val maxDl = dl.agg(coalesce(max("dl"), lit(0L))).head().getLong(0)
    // validate the documented long bounds UP FRONT (the LinkRank.MaxWeight
    // discipline): the saturation fraction runs in plain long arithmetic,
    // and under non-ANSI Spark an overflow would wrap SILENTLY into
    // corrupt scores instead of failing.
    require(BigInt(22) * BigInt(totTok) * BigInt(maxTf) <= BigInt(Long.MaxValue) &&
      BigInt(10) * BigInt(totTok) * BigInt(maxTf) + BigInt(3) * BigInt(totTok) +
        BigInt(9) * BigInt(maxDl) * BigInt(nDocs) <= BigInt(Long.MaxValue),
      s"bm25Retrieve: corpus too large for exact long scoring (totTok=$totTok, " +
        s"nDocs=$nDocs, maxTf=$maxTf, maxDl=$maxDl) — 22*T*tf or 10*T*tf + 3*T + " +
        "9*dl*N would wrap a long; shard the corpus or widen through decimal(38,0)")
    val qidf = floor(log2((lit(2L * nDocs + 2L)).cast("double") /
      (col("df") * 2L + 1L).cast("double")) * 1e6).cast("long")
    val qterms = queries
      .select(col(qidCol).as("qid"), explode(array_distinct(Text.words(col(qtextCol)))).as("w"))
    val contrib = toks
      .join(dl, "doc_id")
      .join(broadcast(dfreq.withColumn("idf_q", qidf)), "w")
      .join(broadcast(qterms), "w")
      .withColumn("c", expr(
        s"cast(idf_q as decimal(38,0)) * (22 * ${totTok}L * tf) " +
          s"div (10 * ${totTok}L * tf + 3 * ${totTok}L + 9 * dl * ${nDocs}L)"))
      .groupBy("qid", "doc_id").agg(sum("c").as("score"))
    contrib
      .groupBy("qid")
      .agg(NativeColumns.topKByScore(col("score").cast("double"), col("doc_id"), k).as("__tk"))
      .select(col("qid"), posexplode(col("__tk")))
      .select(col("qid"), col("col.id").as("doc_id"),
        col("col.score").cast("long").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Reciprocal-Rank-Fusion of per-query ranked lists (Cormack, Clarke &
    * Buettcher 2009) — the standard HYBRID-RETRIEVAL combiner: fuse a
    * lexical ranking ([[bm25Retrieve]]) with a semantic one
    * ([[graft.operators.Similarity.bruteForceTopK]] and friends) without
    * ever comparing their incomparable scores, because RRF consumes only
    * RANKS: `score(d) = Σ_lists 1/(k0 + rank_list(d))`.
    *
    * INTEGER-EXACT: ranks are bounded by `maxRank`, so every reciprocal is
    * one of the denominators `k0+1 .. k0+maxRank`; scoring in units of
    * their LCM makes each contribution `LCM/(k0+rank)` an EXACT long and
    * the fused score an exact integer sum — no float reciprocal ordering
    * hazard (for the classic k0 = 60, maxRank = 10: LCM ≈ 1.4e14, a
    * two-list score ≤ 4.7e12 — comfortable longs, validated up front).
    * Ties break to the lower doc id.
    *
    * Scale shape: inputs are already per-query top-k lists — tiny relative
    * to any corpus (≤ |lists|·maxRank rows per query) — so the fusion is
    * one union + one (qid, doc) exact sum + one ranked window over that
    * bounded frame. Nothing here touches corpus data; the expensive
    * retrieval stages upstream each keep their own scale posture.
    *
    * Input frames need columns `(qid, doc_id, rank)`; ranks must be
    * 1-based and ≤ `maxRank` (validated). Output:
    * `(qid, doc_id, rrf_units, n_lists, rank)` — `n_lists` = how many
    * input lists surfaced the doc (the overlap diagnostic hybrid eval
    * wants), `rank` the fused 1-based order.
    */
  def rrfFuse(lists: Seq[DataFrame], k0: Long, maxRank: Int, k: Int): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k0 >= 0 && maxRank >= 1 && k >= 1, "k0 >= 0, maxRank >= 1, k >= 1")
    val lcm = (1 to maxRank).map(r => BigInt(k0 + r))
      .reduce((a, b) => a * b / a.gcd(b))
    require(lcm * lists.size / (k0 + 1) <= BigInt(Long.MaxValue) / 4,
      s"rrfFuse: LCM $lcm of denominators ${k0 + 1}..${k0 + maxRank} too large for " +
        "exact long scoring — lower maxRank or use a smaller k0")
    val lcmL = lcm.toLong
    val tagged = lists.map(_.select(col("qid"), col("doc_id"), col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
      .withColumn("rank", when(col("rank").between(1, maxRank), col("rank"))
        .otherwise(raise_error(concat(lit(s"rrfFuse: rank out of [1, $maxRank]: "),
          col("rank").cast("string")))))
    // the fused frame is ≤ |lists|·maxRank rows per query BY CONSTRUCTION —
    // a ranked window over it is cheap (unlike over a corpus), and keeps
    // the n_lists diagnostic column through the cut
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("rrf_units").desc, col("doc_id"))
    tagged
      .groupBy("qid", "doc_id")
      // `div`, not `/`: long `/` is a DOUBLE divide; LCM div (k0+rank) is exact
      .agg(sum(expr(s"${lcmL}L div (rank + ${k0}L)")).as("rrf_units"),
        count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(wq).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Bigram-LM surprisal with unigram interpolation — the CCNet-style
    * perplexity quality signal one model order up from
    * [[unigramSurprisal]] (Wenzek et al. 2020 score with a 5-gram KenLM;
    * a bigram captures the same head/tail separation on whitespace
    * tokens while staying exactly recomputable by an external oracle).
    * Per consecutive word pair (w1, w2) the interpolated probability is
    * `p = lambda * c(w1 w2)/c(w1) + (1-lambda) * c(w2)/T` (corpus MLE
    * bigram backed off to the corpus unigram; the unigram floor keeps
    * p > 0, so -log2 is total), and the doc score is the mean of
    * `-log2 p` over its pairs. Output: (doc_id, surprisal, n_bigrams);
    * docs with fewer than 2 words have no pairs and are absent, like
    * [[unigramSurprisal]]'s empty docs.
    *
    * Shape at scale: two narrow count aggregations build the model (the
    * unigram vocab and the bigram table); both — orders of magnitude
    * smaller than the corpus — broadcast into the scoring join, so the
    * pair stream is never shuffled. Both model sides are GUARDED, not
    * assumed small: the unigram sides broadcast only while the probed
    * vocabulary cardinality fits `maxBroadcastVocab` (the cardinality
    * rides the same scalar action that reads T, so the guard costs zero
    * extra corpus passes — the [[graft.features.Encoders]] probe-then-
    * fallback discipline), else they shuffle-join; past a broadcastable
    * bigram vocabulary, pass `broadcastBigrams = false` for the (w1, w2)
    * side. T comes back as a two-phase scalar literal; the per-doc mean
    * is one map-side-combinable aggregation.
    *
    * Determinism: the -log2 terms quantize to decimal(38,3) before the
    * order-independent sum ([[unigramSurprisal]]'s idiom); the
    * interpolation arithmetic is the same IEEE-754 expression tree on
    * both engines (lambda and 1-lambda interpolate into the oracle SQL
    * as exact Scala Double literals).
    */
  def bigramSurprisal(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.7,
      broadcastBigrams: Boolean = true,
      maxBroadcastVocab: Long = DefaultMaxBroadcastVocab): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0, 1)")
    require(maxBroadcastVocab >= 1, "maxBroadcastVocab must be >= 1")
    val ws = docs.select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__ws"))
    val toks = ws.select(col("doc_id"), explode(col("__ws")).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("cu"))
    // empty-corpus guard, as in [[unigramSurprisal]]; the vocabulary
    // cardinality (the unigram-broadcast guard) rides the SAME action
    val totalRow = uni.agg(sum("cu"), count(lit(1))).head()
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val vocabFits = totalRow.getLong(1) <= maxBroadcastVocab
    def uniSide(df: DataFrame): DataFrame = if (vocabFits) broadcast(df) else df
    val pairs = ws.select(col("doc_id"), explode(
      when(size(col("__ws")) >= 2, transform(
        sequence(lit(1), size(col("__ws")) - 1),
        i => struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val p =
      lit(lambda) * (col("cb").cast("double") / col("cu1").cast("double")) +
        lit(1 - lambda) * (col("cu2").cast("double") / lit(total).cast("double"))
    // the bigram table grows toward vocab^2 on large corpora: past the
    // broadcast budget, callers pass broadcastBigrams = false and the
    // (w1, w2) join shuffles instead — the unigram sides broadcast only
    // under the cardinality guard probed above (a web-scale vocabulary
    // is tens of millions of rows: multi-GB broadcast, executor OOM)
    val biSide = if (broadcastBigrams) broadcast(bi) else bi
    pairs
      .join(biSide, Seq("w1", "w2"))
      .join(uniSide(uni.select(col("w").as("w1"), col("cu").as("cu1"))), "w1")
      .join(uniSide(uni.select(col("w").as("w2"), col("cu").as("cu2"))), "w2")
      .withColumn("t", -log2(p))
      .groupBy("doc_id")
      .agg(
        (sum(col("t").cast("decimal(38,3)")).cast("double") / count(lit(1)))
          .as("surprisal"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Hashed-feature linear quality classifier — fastText-shaped inference
    * (Joulin et al. 2017: bag of words + word-bigram features, hashing
    * trick into `dim` buckets, linear scoring) as one codegen'd per-row
    * projection: score a 100 TB corpus with a scan and zero shuffles.
    * In production the per-bucket weight vector is learned offline and
    * broadcast; here weights derive deterministically from (`seed`,
    * bucket) through the oracle-computable md5 hash — same bucketing,
    * same arithmetic, and bucket collisions sharing a weight is the
    * hashing trick behaving normally, not an artifact.
    *
    * Scoring is EXACT-INTEGER: weight(g) = md5hash64("w" + seed +
    * bucket(g)) mod 2001 - 1000 (a long in [-1000, 1000], bucket(g) =
    * md5hash64(g) mod dim), `score_int` the plain long sum over unigram +
    * bigram features (order-independent), and `score = score_int /
    * (1000.0 * n_features)` in [-1, 1] — one division of exact operands,
    * bit-identical on every IEEE engine. `keep` thresholds the raw score;
    * the sigmoid a trained classifier would apply is monotone, so
    * thresholding the linear score is the same decision rule without the
    * cross-engine `exp` hazard. Docs with no features score 0 and drop.
    */
  def hashedClassifierScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 256,
      seed: String = "s0",
      threshold: Double = 0.0): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    def weight(g: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      pmod(Text.md5Hash64(concat(lit("w"), lit(seed),
        pmod(Text.md5Hash64(g), lit(dim)).cast("string"))), lit(2001)) - 1000
    val ws = docs.select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__ws"))
    val feats = concat(col("__ws"), Text.ngramsFromWords(col("__ws"), 2))
    ws
      .withColumn("n_features", size(feats).cast("long"))
      .withColumn("score_int",
        aggregate(transform(feats, weight(_)), lit(0L), (acc, x) => acc + x))
      .withColumn("score",
        when(col("n_features") > 0,
          col("score_int").cast("double") / (lit(1000.0) * col("n_features").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("keep", col("n_features") > 0 && col("score") >= threshold)
      .select("doc_id", "n_features", "score_int", "score", "keep")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): rank
    * docs by LM surprisal, split into head / middle / tail thirds, then
    * keep each bucket at its own rate (head kept whole, tail mostly
    * dropped is the classic mix) via the deterministic key-hash rule of
    * [[Selection.hashSample]]. Output: (doc_id, surprisal, bucket, keep).
    *
    * ORACLE/SMALL-CORPUS FORM — [[perplexityBucketsByCutoffs]] is the
    * production default. Bucket boundaries here come from an EXACT global
    * rank (row_number ordered by (surprisal, doc_id)) so the assignment
    * is reproducible row-for-row by an external oracle — but that rank is
    * an UNPARTITIONED window (one task sorts every score row), so the
    * form is ENFORCED small: it aborts past `maxExactRank` docs instead
    * of silently single-tasking a corpus-sized sort. At scale, production
    * derives cutoffs once (on a [[Selection.hashSample]] of scores, as
    * CCNet computes its percentiles on a sample) and applies them as
    * literals through [[perplexityBucketsByCutoffs]], which is a pure
    * scan-shaped filter.
    */
  def perplexityBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rates: Map[String, Double] = Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.1),
      salt: String = "",
      maxExactRank: Long = 10000000L): DataFrame = {
    val scored = unigramSurprisal(docs, idCol, textCol)
    val n = scored.count()
    require(n <= maxExactRank,
      s"perplexityBuckets ranks $n docs through one unpartitioned window task " +
        s"(bound: $maxExactRank) — this exact-rank form is for oracle/small-corpus " +
        "use; at scale derive cutoffs on a hashSample and use perplexityBucketsByCutoffs")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("surprisal"), col("doc_id"))
    val ranked = scored
      .withColumn("__rn", row_number().over(w))
      .withColumn("bucket",
        when(col("__rn") * 3 <= n, "head")
          .when(col("__rn") * 3 <= 2 * n, "middle")
          .otherwise("tail"))
    bucketKeep(ranked, rates, salt)
      .select("doc_id", "surprisal", "bucket", "keep")
  }

  /** THE PRODUCTION DEFAULT for perplexity bucketing: cutoffs as literals
    * (head < `c1` <= middle < `c2` <= tail), no rank, no sort — the
    * bucket rule and keep filter both collapse into the scan, so the form
    * is corpus-scale by construction. Derive `c1`/`c2` once on a
    * [[Selection.hashSample]] of scores (the CCNet percentile-on-a-sample
    * recipe); [[perplexityBuckets]] (exact rank, enforced small) exists
    * for oracle verification of the assignment rule.
    */
  def perplexityBucketsByCutoffs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      c1: Double,
      c2: Double,
      rates: Map[String, Double] = Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.1),
      salt: String = ""): DataFrame = {
    require(c1 <= c2, "cutoffs must be ordered")
    val scored = unigramSurprisal(docs, idCol, textCol)
      .withColumn("bucket",
        when(col("surprisal") < c1, "head")
          .when(col("surprisal") < c2, "middle")
          .otherwise("tail"))
    bucketKeep(scored, rates, salt)
      .select("doc_id", "surprisal", "bucket", "keep")
  }

  /** Shared keep rule: per-bucket rate through the [[Selection.hashSample]]
    * key-hash (buckets absent from `rates` keep nothing).
    */
  private def bucketKeep(scored: DataFrame, rates: Map[String, Double], salt: String): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0, 1]")
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (b, r)) =>
      when(col("bucket") === b, lit(r)).otherwise(acc)
    }
    scored.withColumn("keep",
      pmod(Text.md5Hash64(concat(col("doc_id").cast("string"), lit(salt))), lit(10000)) <
        floor(rate * 10000.0 + 0.5))
  }

  /** Gopher-style repetition gate (Rae et al. 2021 §A1.1 "repetitious
    * text"): per-doc mass fractions of the single most frequent unigram
    * and 2-gram — the signal that catches "the the the" boilerplate and
    * templated spam that whole-doc dedup and the per-row
    * [[graft.functions.Text.repetitionRatio]] (distinct/total) both
    * under-report (a doc repeating ONE gram thousands of times has high
    * top-gram mass but also high distinct-ratio denominator). Combined
    * with word-count and mean-word-length bounds into a boolean `keep`.
    *
    * Shape at scale: two narrow posting-list aggregations — explode to
    * (doc, gram), hash-partition by doc_id ONCE so the (doc, gram) count
    * and the per-doc max/sum roll-up reuse the same exchange; text never
    * crosses the wire twice, nothing is pairwise. The fractions are exact
    * long-ratio doubles (single division, both engines IEEE-identical).
    *
    * Docs below `n` words have no 2-grams: their top2gram_frac is defined
    * 0.0 (nothing repeated), keeping the keep-rule total.
    */
  def gopherRules(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 10,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 10.0,
      maxTopUnigramFrac: Double = 0.10,
      maxTop2gramFrac: Double = 0.05): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      Text.words(col(textCol)).as("__ws"))
      .select(col("doc_id"), col("__ws"),
        size(col("__ws")).cast("long").as("word_count"),
        Text.avgWordLenFromWords(col("__ws")).as("mean_word_len"))

    def topFrac(gramCol: DataFrame => org.apache.spark.sql.Column, name: String) = {
      val posted = base
        .select(col("doc_id"), explode(gramCol(base)).as("g"))
        .repartition(col("doc_id"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      posted.groupBy("doc_id").agg(
        (max(col("cnt")).cast("double") / sum(col("cnt")).cast("double")).as(name))
    }
    val uni = topFrac(_("__ws"), "top_unigram_frac")
    val bi = topFrac(b => Text.ngramsFromWords(b("__ws"), 2), "top_2gram_frac")

    base.join(uni, Seq("doc_id"), "left")
      .join(bi, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("word_count"), col("mean_word_len"),
        coalesce(col("top_unigram_frac"), lit(0.0)).as("top_unigram_frac"),
        coalesce(col("top_2gram_frac"), lit(0.0)).as("top_2gram_frac"))
      .withColumn("keep",
        col("word_count").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("top_unigram_frac") <= maxTopUnigramFrac &&
          col("top_2gram_frac") <= maxTop2gramFrac)
  }

  /** TRAIN the hashed-feature linear classifier at corpus scale — the
    * learning half of [[hashedClassifierScore]] (which scores with a
    * given weight vector): full-batch averaged-update perceptron
    * (Rosenblatt 1958; the distributed-trainer shape of fastText-class
    * document filters) over the same md5 feature hashing.
    *
    * ALL arithmetic is integer — counts, ±1 labels, and weight sums —
    * so the trained vector is bit-reproducible and the DuckDB oracle can
    * unroll the identical iterations (a float learning rate would make
    * the update order-sensitive; with lr ≡ 1 the perceptron update is a
    * pure integer sum, and scale of `w` is irrelevant to the sign
    * decisions it drives).
    *
    * Scale shape: the hashed feature table (doc, y, f, x) is built once,
    * persisted hash-partitioned by doc (each round's margin aggregation
    * reuses the partitioning); per round the corpus is touched twice —
    * margins (join with the ≤`dim`-row broadcast weight vector, group by
    * doc) and the misclassified-set gradient (group by f). The weight
    * vector itself lives on the driver between rounds (≤ `dim` rows —
    * the model IS driver-small, same contract as [[graft.functions.Bpe.trainVocab]]
    * and the IVF centroids). Rounds are a fixed small count: a handful
    * of full-batch passes separates the classes a data filter needs;
    * convergence-chasing buys nothing for selection.
    */
  def trainPerceptron(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int = 256,
      iters: Int = 3): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    require(iters >= 1 && iters <= 8, s"iters $iters out of [1,8] — fixed small-round contract")
    val spark = docs.sparkSession
    import spark.implicits._
    // SAME feature space as hashedClassifierScore (unigrams + word
    // bigrams, md5-hashed into dim buckets) — a vector trained here
    // drives scoreWithWeights/hashedClassifierScore-shaped inference
    // directly
    val ws0 = docs.select(col(idCol).as("doc"), col(labelCol).cast("long").as("y"),
      Text.words(col(textCol)).as("__ws"))
    val feats = ws0
      .select(col("doc"), col("y"),
        explode(concat(col("__ws"), Text.ngramsFromWords(col("__ws"), 2))).as("g"))
      .select(col("doc"), col("y"),
        pmod(Text.md5Hash64(col("g")), lit(dim.toLong)).as("f"))
      .groupBy("doc", "y", "f").agg(count(lit(1)).as("x"))
      .repartition(col("doc"))
      .persist()
    // round 1 from w = 0: every margin is 0 and y*0 <= 0, so ALL docs are
    // misclassified — the first update needs no join
    var w: Map[Long, Long] = feats.groupBy("f")
      .agg(sum(col("y") * col("x")).as("wv"))
      .as[(Long, Long)].collect().toMap
    for (_ <- 2 to iters) {
      val wDF = w.toSeq.toDF("f", "wv")
      val mis = feats.join(broadcast(wDF), Seq("f"), "left")
        .groupBy("doc", "y")
        .agg(sum(col("x") * coalesce(col("wv"), lit(0L))).as("m"))
        .filter(col("y") * col("m") <= 0)
        .select("doc")
      val upd = feats.join(mis, "doc")
        .groupBy("f").agg(sum(col("y") * col("x")).as("u"))
        .as[(Long, Long)].collect().toMap
      w = (w.keySet ++ upd.keySet).iterator
        .map(f => f -> (w.getOrElse(f, 0L) + upd.getOrElse(f, 0L))).toMap
    }
    feats.unpersist()
    w.toSeq.sortBy(_._1).toDF("f", "wv")
  }

  /** Score documents with a TRAINED weight vector ([[trainPerceptron]]'s
    * output, collected — ≤ `dim` entries, the model is driver-small by
    * contract): the weights inline as a literal map, so scoring is a
    * zero-shuffle codegen-friendly projection exactly like
    * [[hashedClassifierScore]] — the same "broadcast the tiny model into
    * the expression" shape as the IVF centroid literals. `keep` is the
    * sign decision (`score_int > 0`): the trained perceptron's class
    * boundary, no threshold tuning.
    */
  def scoreWithWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: Map[Long, Long],
      dim: Int = 256): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    val wMap =
      if (weights.isEmpty) typedLit(Map.empty[Long, Long])
      else map(weights.toSeq.sortBy(_._1)
        .flatMap { case (f, v) => Seq(lit(f), lit(v)) }: _*)
    val ws = docs.select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__ws"))
    val feats = concat(col("__ws"), Text.ngramsFromWords(col("__ws"), 2))
    ws
      // null text => null feature array; size(null) is -1 under ANSI-off
      // (not 0), so guard explicitly — a null-text doc reports 0 features
      // and score 0 like an empty one (consistent shape, and the apply
      // oracle's LEFT JOIN + COALESCE computes exactly this)
      .withColumn("n_features",
        when(feats.isNull, lit(0L)).otherwise(size(feats).cast("long")))
      .withColumn("score_int",
        coalesce(aggregate(transform(feats, g =>
          coalesce(element_at(wMap, pmod(Text.md5Hash64(g), lit(dim.toLong))), lit(0L))),
          lit(0L), (acc, x) => acc + x), lit(0L)))
      .withColumn("keep", col("n_features") > 0 && col("score_int") > 0)
      .select("doc_id", "n_features", "score_int", "keep")
  }
}
