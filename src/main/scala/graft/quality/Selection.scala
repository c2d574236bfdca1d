package graft.quality

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data selection: score-quantile document filtering — the
  * standard "drop the bottom X% by quality" step of an LLM data pipeline,
  * composed with [[graft.functions.Text.qualityScore]] (or any numeric
  * score column).
  */
object Selection {

  /** Keep rows whose `scoreCol` is at or above the exact `quantile` of the
    * frame. Two-phase, like the watermark read
    * ([[graft.operators.Incremental.maxWatermark]]): one tiny aggregate job
    * computes the exact interpolated percentile, then the threshold filters
    * as a LITERAL predicate — pushdown-friendly, no window, and crucially
    * no single-partition global sort (a `percent_rank` window over the
    * whole corpus would funnel 100 TB through one task).
    *
    * The exact `percentile` aggregate buffers per-partition values, which
    * is fine into the billions of rows but heavy at the extreme — at that
    * point swap in `approx_percentile` (the output then stops being
    * engine-reproducible; the exact form is what keeps the differential
    * oracle valid, and any interpolated threshold strictly between two
    * order statistics yields the same FILTERED SET on every engine even if
    * its last bits differ).
    */
  def filterByScoreQuantile(df: DataFrame, scoreCol: String, quantile: Double): DataFrame = {
    require(quantile >= 0.0 && quantile <= 1.0, "quantile must be in [0, 1]")
    val row = df.agg(expr(s"percentile($scoreCol, $quantile)")).head()
    if (row.isNullAt(0)) df.limit(0) // empty input: nothing at any quantile
    else df.filter(col(scoreCol) >= row.getDouble(0))
  }

  /** Approximate counterpart of [[filterByScoreQuantile]] for the extreme
    * where even the exact percentile's per-partition value buffers are too
    * heavy: `approx_percentile` keeps a bounded-memory sketch per
    * partition, merged once — O(accuracy) state regardless of row count.
    * The threshold (and so the kept set's boundary) is sketch-dependent,
    * hence no cross-engine oracle; SelectionSpec bounds the kept fraction
    * against the target. Same two-phase literal shape: the filter itself
    * is pushdown-friendly.
    */
  def filterByScoreQuantileApprox(
      df: DataFrame,
      scoreCol: String,
      quantile: Double,
      accuracy: Int = 10000): DataFrame = {
    require(quantile >= 0.0 && quantile <= 1.0, "quantile must be in [0, 1]")
    val row = df.agg(expr(s"approx_percentile($scoreCol, $quantile, $accuracy)")).head()
    if (row.isNullAt(0)) df.limit(0)
    else df.filter(col(scoreCol) >= lit(row.get(0)))
  }

  /** Deterministic hash sample: keeps a row iff
    * `md5hash64(key || salt) mod 10000 < rate * 10000`. Unlike
    * `df.sample()` (seeded RNG over partition iteration order — different
    * rows after a repartition), the kept set is a pure function of the KEY:
    * reproducible across runs, engines, partitionings, and cluster sizes,
    * and consistent across tables sharing the key (sample `documents` and
    * its `embeddings` at the same rate/salt and the join is sample-aligned).
    * `salt` decorrelates independent samples at the same rate. Pure
    * filter — pipelines into the scan, no shuffle.
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double, salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    val bucket = pmod(Text.md5Hash64(concat(col(keyCol).cast("string"), lit(salt))), lit(10000))
    df.filter(bucket < math.round(rate * 10000))
  }

  /** STRATIFIED sample: exactly `min(k, |stratum|)` rows per stratum,
    * chosen as the k smallest deterministic hash-ranks (uniform within the
    * stratum, reproducible across runs/engines/partitionings like
    * [[hashSample]]; `salt` decorrelates draws). The balanced-per-group
    * counterpart to the rate-based [[hashSample]] — e.g. equal-size
    * per-language eval subsets from a wildly imbalanced corpus.
    *
    * Scale shape: the rank heap runs as a map-side-bounded k-heap aggregate
    * ([[graft.functions.expressions.TopKByScore]]) over narrow
    * (strata, id, rank) rows — the exchange carries O(k) rows per stratum
    * per partition, never a per-stratum sort window — and the winners
    * (|strata| x k ids, tiny by construction) come back as a BROADCAST
    * semi-join, so the full-width corpus is never shuffled at all.
    *
    * Rank ties (two ids hashing to doubles that compare equal) break to the
    * lower id — same rule as an `ORDER BY rank, id` row_number, so external
    * oracles reproduce the exact kept set.
    *
    * `idCol` must be an INTEGRAL column — validated up front (see
    * [[requireIntegralId]]); it need NOT be globally unique — the winners
    * come back keyed by (strata, id), so an id reused across strata keeps
    * rows only in the strata where it was actually picked.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    requireIntegralId(df, idCol, "stratifiedSample")
    val rank = Text.md5Hash64(concat(col(idCol).cast("string"), lit(salt)))
    val picked = df
      .select(strataCols.map(col) :+ col(idCol).cast("long").as("__id") :+
        (-rank.cast("double")).as("__score"): _*)
      .groupBy(strataCols.map(col): _*)
      .agg(org.apache.spark.sql.graftnative.NativeColumns
        .topKByScore(col("__score"), col("__id"), k).as("__tk"))
      .select(strataCols.map(c => col(c).as(s"__s_$c")) :+
        explode(col("__tk")).as("__e"): _*)
      .select(strataCols.map(c => col(s"__s_$c")) :+
        col("__e.id").as("__picked_id"): _*)
    // semi-join on (strata, id) — null-safe on strata, since groupBy keeps
    // a null stratum as its own group
    val cond = strataCols.map(c => df(c) <=> picked(s"__s_$c"))
      .foldLeft(df(idCol).cast("long") === picked("__picked_id"))(_ && _)
    df.join(broadcast(picked), cond, "left_semi")
  }

  /** WEIGHTED sample without replacement: exactly `min(k, n)` rows, where a
    * row's inclusion odds scale with `weightCol` (Efraimidis–Spirakis
    * exponential-sort: draw u ~ U(0,1] per row, keep the k largest
    * u^(1/w) — equivalently the k largest log2(u)/w). The
    * token-count-weighted draw of an LLM data mix ("sample documents
    * proportional to tokens").
    *
    * Deterministic and cross-engine-reproducible like [[hashSample]]:
    * u = (md5hash64(id||salt) mod 2^20 + 1) / 2^20 — a DYADIC rational, so
    * the division is exact — and the rank key is
    * `floor(log2(u) * 1e6) / w`, quantizing the one transcendental term to
    * an integer (the [[Scoring.unigramSurprisal]] idiom) so the remaining
    * division has exactly-representable operands and is correctly rounded
    * to the same bits on every engine. Ties (same quantized key) break to
    * the lower id.
    *
    * Scale shape = [[stratifiedSample]]'s: a map-side-bounded k-heap
    * aggregate over narrow (id, key) rows, winners back as a broadcast
    * semi-join — no global sort, the corpus never shuffles.
    *
    * Rows with null or non-positive weight are excluded (a zero weight
    * cannot win a draw; a negative one is a caller bug).
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    requireIntegralId(df, idCol, "weightedSample")
    val M = 1048576L // 2^20
    val h = pmod(Text.md5Hash64(concat(col(idCol).cast("string"), lit(salt))), lit(M))
    val qlog = floor(log2((h + 1).cast("double") / lit(M.toDouble)) * 1e6).cast("long")
    val key = qlog.cast("double") / col(weightCol).cast("double")
    val picked = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol).cast("long").as("__id"), key.as("__key"))
      .groupBy()
      .agg(org.apache.spark.sql.graftnative.NativeColumns
        .topKByScore(col("__key"), col("__id"), k).as("__tk"))
      .select(explode(col("__tk")).as("__e"))
      .select(col("__e.id").as("__picked_id"))
    df.join(broadcast(picked), col(idCol).cast("long") === col("__picked_id"), "left_semi")
  }

  /** Per-stratum cap: keep the `k` BEST rows of each stratum by
    * `scoreCol` (ties to the lower id) — the per-domain document cap of a
    * web-corpus pipeline (bound any one domain's share of the corpus,
    * keeping its highest-quality pages), and the generic "top-k per
    * group" curation primitive. Equivalent to
    * `row_number() OVER (PARTITION BY strata ORDER BY score DESC, id) <= k`
    * but WITHOUT the per-stratum sort window: same map-side-bounded
    * k-heap aggregate + broadcast semi-join shape as
    * [[stratifiedSample]] — the exchange carries O(k) rows per stratum
    * per partition and the full-width corpus never shuffles. (Beyond
    * broadcastable |strata| x k winners, swap the pick-up join to a
    * shuffle semi-join; the heap side is unchanged.)
    *
    * `scoreCol` must be numeric and deterministic; null scores are
    * excluded (a null can't rank). `idCol` integral, as for the other
    * heap samplers (see [[requireIntegralId]]).
    */
  def capPerStratum(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      scoreCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    requireIntegralId(df, idCol, "capPerStratum")
    val picked = df
      .filter(col(scoreCol).isNotNull)
      .select(strataCols.map(col) :+ col(idCol).cast("long").as("__id") :+
        col(scoreCol).cast("double").as("__score"): _*)
      .groupBy(strataCols.map(col): _*)
      .agg(org.apache.spark.sql.graftnative.NativeColumns
        .topKByScore(col("__score"), col("__id"), k).as("__tk"))
      .select(strataCols.map(c => col(c).as(s"__s_$c")) :+
        explode(col("__tk")).as("__e"): _*)
      .select(strataCols.map(c => col(s"__s_$c")) :+
        col("__e.id").as("__picked_id"): _*)
    val cond = strataCols.map(c => df(c) <=> picked(s"__s_$c"))
      .foldLeft(df(idCol).cast("long") === picked("__picked_id"))(_ && _)
    df.join(broadcast(picked), cond, "left_semi")
  }

  /** Per-stratum weighted sampling WITHOUT replacement: exactly
    * `min(k, |stratum|)` rows per stratum, drawn with probability
    * proportional to `weightCol` — [[weightedSample]]'s
    * Efraimidis–Spirakis keys ranked inside [[capPerStratum]]'s grouped
    * k-heap instead of one global heap. The balanced-and-weighted
    * selection an LLM mixture plan actually wants ("N docs per language,
    * longer docs proportionally likelier") in one pass: same dyadic
    * uniform, same 1e6-quantized log2, same exact-operand division, so
    * any engine re-derives every key and the same per-stratum top-k
    * (ties to the lower id). Zero-or-negative/null weights are excluded
    * (they cannot win a draw).
    *
    * Scale shape: the heap aggregate carries O(k) rows per stratum per
    * partition; winners come back as one broadcast semi-join — the
    * corpus never shuffles (capPerStratum's contract verbatim).
    */
  def weightedStratifiedSample(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    requireIntegralId(df, idCol, "weightedStratifiedSample")
    val M = 1048576L // 2^20
    val h = pmod(Text.md5Hash64(concat(col(idCol).cast("string"), lit(salt))), lit(M))
    val qlog = floor(log2((h + 1).cast("double") / lit(M.toDouble)) * 1e6).cast("long")
    val key = qlog.cast("double") / col(weightCol).cast("double")
    capPerStratum(
      df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
        .withColumn("__eskey", key),
      strataCols, idCol, "__eskey", k)
      .drop("__eskey")
  }

  /** Sequence packing: assign documents to fixed-token-budget packs — the
    * standard pre-training batching step (concatenate ~`budget` tokens per
    * training sequence). Deterministic streaming assignment: docs are
    * ordered by `idCol` WITHIN each `shardCol` partition, and a doc starts
    * at the running token total before it, so
    * `pack_id = floor(cum_before / budget)`.
    *
    * Scale: the window partitions by shard — pack locality is per shard
    * (language, source, date bucket...), so no global sort exists anywhere
    * and each shard's cumsum is an independent task. A budget-overflow doc
    * (tokens > budget) still lands in exactly one pack, as in practice
    * (it gets truncated downstream).
    */
  def packByTokenBudget(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      shardCol: String): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
    docs
      .withColumn("__cum_before", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("pack_id", expr(s"__cum_before div $budget"))
      .drop("__cum_before")
  }

  /** [[packByTokenBudget]] extended to the PACK MANIFEST a trainer's data
    * loader actually consumes: per doc, its byte-level placement inside
    * the pack — `offset` (token position where the doc starts),
    * `n_tokens`, and `overflow_tokens` (how many of its tokens spill past
    * the budget boundary — the portion a loss mask truncates or the
    * loader wraps). The offsets double as the cross-document attention
    * boundaries (a doc's span is `[offset, offset + n_tokens)`), so this
    * one frame carries everything sequence assembly needs. All integer
    * window arithmetic over the same per-shard cumsum as the packer —
    * zero extra exchanges.
    */
  def packManifest(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      shardCol: String): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
    docs
      .withColumn("__cb", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("pack_id", expr(s"__cb div $budget"))
      .withColumn("offset", col("__cb") - col("pack_id") * budget)
      .withColumn("overflow_tokens",
        greatest(lit(0L), col("offset") + col(tokenCol) - budget))
      .drop("__cb")
  }

  /** CURRICULUM INTERLEAVE: a deterministic global training order that
    * round-robins across quality tiers — position `p` of tier `t` (both
    * 0-based) trains at `order_idx = p * maxTiers + tierRank(t)`, so
    * every window of `maxTiers` consecutive examples sees every tier
    * once (the standard anti-forgetting mix schedule), and the order is
    * a pure function of (tier, id): reproducible across runs, engines,
    * and restarts.
    *
    * 100 TB shape — the naive form is a SCALE BUG and this one is not:
    * `row_number over (partition by tier)` puts each tier in ONE task (a
    * dominant tier = one executor sorting terabytes). Here the per-tier
    * rank is TWO-PHASE distributed ranking: ids group into ORDERED
    * coarse buckets (`id div granularity`); per-(tier, bucket) counts
    * aggregate map-side; the running offset rides a window over that
    * tiny count frame (≤ tiers × buckets rows); and the final rank =
    * offset + rank within (tier, bucket) — a window over MANY fine
    * partitions. The oracle computes the same positions with a plain
    * global row_number, so the hash proves two-phase == global rank.
    *
    * `maxTiers` is the round-robin stride (enforced: more distinct tiers
    * than `maxTiers` fails fast rather than silently colliding order
    * indices).
    */
  def curriculumInterleave(
      docs: DataFrame,
      tierCol: String,
      idCol: String,
      maxTiers: Int = 16,
      granularity: Long = 1024L): DataFrame = {
    require(maxTiers >= 1, "maxTiers must be >= 1")
    require(granularity >= 1, "granularity must be >= 1")
    val tiers = docs.select(col(tierCol)).distinct()
    require(tiers.limit(maxTiers + 1).count() <= maxTiers,
      s"curriculumInterleave: more than $maxTiers distinct tiers — raise maxTiers " +
        "(the round-robin stride) or bucket tiers upstream")
    val tierRank = tiers.withColumn("__tr",
      (row_number().over(Window.orderBy(tierCol)) - 1).cast("long"))
    val bucketed = docs.withColumn("__bk", expr(s"${idCol} div $granularity"))
    // phase 1: per-(tier, bucket) counts — map-side combined, tiny result
    val counts = bucketed.groupBy(col(tierCol), col("__bk"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum("__c").over(Window.partitionBy(tierCol).orderBy("__bk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("__c"),
          lit(0L)))
      .drop("__c")
    // phase 2: rank within the FINE (tier, bucket) partitions + offset
    val wFine = Window.partitionBy(col(tierCol), col("__bk")).orderBy(idCol)
    // counts joins on the SAME (tier, bucket) keys the fine window
    // partitions by — no broadcast hint, so Catalyst either broadcasts a
    // frame it can see is small or co-partitions with the window exchange
    bucketed
      .join(counts, Seq(tierCol, "__bk"))
      .join(broadcast(tierRank), Seq(tierCol))
      .withColumn("tier_pos",
        col("__off") + row_number().over(wFine).cast("long") - 1L)
      .withColumn("tier_rank", col("__tr"))
      .withColumn("order_idx", col("tier_pos") * maxTiers + col("__tr"))
      .drop("__bk", "__off", "__tr")
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS 2023): pick the raw-corpus documents whose hashed-unigram
    * distribution looks most like a small TARGET corpus, by per-document
    * importance weight `log p_target(x) − log p_raw(x)` under two
    * bag-of-hashed-ngrams unigram models. The standard "make 100 TB of
    * crawl look like Wikipedia" curation step, and the distribution-level
    * complement of the engine's pointwise quality scorers
    * ([[graft.quality.Scoring.hashedClassifierScore]] learns labels;
    * DSIR needs only the target corpus itself).
    *
    * Model: token -> bucket `md5hash64(w || salt) mod buckets` (the
    * [[hashSample]] hash, so any engine recomputes it); each side's
    * bucket distribution is Laplace-smoothed `(c_b + 1) / (T + B)`.
    * Per-bucket log-likelihood ratio quantized ONCE in the model table —
    * `floor(log2 p_t * 1e6) − floor(log2 p_r * 1e6)` (the shared
    * `floor(log2(x)*1e6)` residual assumption, [[graft.quality.Scoring
    * .tfidfTopTerms]]) — so a document's weight is an EXACT long sum of
    * table entries over its token occurrences. Top-`k` by
    * (weight desc, id), the `TakeOrderedAndProject` shape.
    *
    * Scale shape: both count tables aggregate to ≤ `buckets` rows and
    * broadcast; the raw corpus is tokenized twice (count pass + score
    * pass — the [[graft.quality.Scoring.perceptronTrain]] corpus-touched-
    * twice posture) and never shuffled wider than (doc_id, bucket);
    * ranking is a map-side-bounded ordered take, not a global sort.
    * Output: (doc_id, carried…, dsir_units, n_tokens), the k winners.
    */
  def dsirSelect(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      carryCols: Seq[String],
      buckets: Int,
      k: Int,
      salt: String = ""): DataFrame = {
    require(buckets > 0 && k > 0, "buckets and k must be positive")
    def bucketed(df: DataFrame) = df
      .select(col(idCol).as("__id"), explode(Text.words(col(textCol))).as("__w"))
      .select(col("__id"), pmod(Text.md5Hash64(concat(col("__w"), lit(salt))),
        lit(buckets.toLong)).as("__b"))
    val rawToks = bucketed(raw)
    val cr = rawToks.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val ct = bucketed(target).groupBy("__b").agg(count(lit(1)).as("__ct"))
    // totals ride an unpartitioned window over the ≤2·buckets-row model
    // frame (the driftPsiFromCounts no-driver-scalars discipline — a
    // crossJoin of 1-row totals would plan a nested-loop join); the FULL
    // outer keeps target-only buckets in the target total
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    def qlog2(num: Column, den: Column): Column =
      floor(log2(num.cast("double") / den.cast("double")) * 1e6).cast("long")
    val lr = cr.join(ct, Seq("__b"), "full_outer")
      .withColumn("__tr", sum("__cr").over(w))
      .withColumn("__tt", coalesce(sum("__ct").over(w), lit(0L)))
      .filter(col("__cr").isNotNull)
      .select(col("__b"),
        (qlog2(coalesce(col("__ct"), lit(0L)) + 1L, col("__tt") + buckets.toLong) -
          qlog2(col("__cr") + 1L, col("__tr") + buckets.toLong)).as("__lr"))
    val scored = rawToks
      .join(broadcast(lr), Seq("__b"))
      .groupBy(col("__id"))
      .agg(sum("__lr").as("dsir_units"), count(lit(1)).as("n_tokens"))
    raw.select(col(idCol) +: carryCols.map(col): _*)
      .join(scored, col(idCol) === col("__id"))
      .drop("__id")
      .orderBy(col("dsir_units").desc, col(idCol))
      .limit(k)
  }

  /** The heap samplers carry ids through
    * [[graft.functions.expressions.TopKByScore]] as longs. An id of any
    * non-integral type would cast to null (the row silently never wins a
    * heap slot) or — worse — two distinct ids could collide after the
    * cast and BOTH survive the pick-up semi-join. Requiring an integral
    * column makes the long cast total and injective, so neither failure
    * is expressible. Non-integral ids should be mapped through a
    * dictionary (or xxhash64 with collision monitoring) by the caller,
    * explicitly.
    */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new IllegalArgumentException(
        s"$op requires an integral id column ('$idCol' is ${dt.catalogString}): " +
          "the k-heap carries ids as longs, and a lossy cast would silently drop or conflate rows")
    }
  }
}
