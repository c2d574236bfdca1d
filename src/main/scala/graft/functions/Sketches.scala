package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog), built DETERMINISTIC and
  * CROSS-ENGINE-EXACT so the register tables themselves are oracle-checkable:
  * the hash is [[Text.md5Hash64]] (md5 hex prefix — identical in any SQL
  * engine), the rank is an integer bit-length (`length(bin(w))`, identical in
  * Spark and DuckDB), and the estimator is pure 64-bit integer arithmetic
  * (shift + floor-div — no IEEE-754 anywhere). Spark's own
  * `approx_count_distinct` is also HLL but its xxhash64/layout is private to
  * Spark; this family exists for the 100 TB pattern Spark's one-shot
  * aggregate cannot do: PERSIST a tiny per-partition (e.g. per-day) register
  * table as state, then answer "distinct over any day range / all history"
  * by merging sketches — a few-hundred-row max-aggregation — instead of
  * rescanning the corpus. Register max is associative and idempotent, so
  * merge order, batch slicing, and replay are all harmless (the same
  * winner-of-winners argument as [[graft.operators.Cdc]]).
  *
  * Precision: p = 8 -> m = 256 registers, standard error 1.04/sqrt(m) = 6.5%.
  * A register row is two small integers; a year of daily sketches is ~93k
  * rows — trivial at rest and in the merge. The raw-HLL estimator is used
  * WITHOUT the small-range linear-counting correction (it needs a float
  * log); below n ~ 3m the raw estimate biases low, so this family targets
  * large-n distincts (its whole point). [[hllEstimate]] reports `n_low`
  * alongside the estimate so callers can see when they are in that regime.
  */
object Sketches {
  /** Register-count exponent: m = 2^p registers. */
  val HllP = 8
  val HllM: Long = 1L << HllP

  /** Rank cap: keeps every `2^(RankCap - r)` term and the estimator's
    * numerator far inside 64-bit. P(any true rank > 40) is ~n/2^48 —
    * unreachable; the cap only guards adversarial inputs.
    */
  val RankCap = 40

  /** floor(alpha_m * m^2) for m = 256 (alpha = 0.7213/(1 + 1.079/m)) — the
    * exact literal every oracle mirrors.
    */
  val AlphaM2 = 47072L

  /** The rank of one hashed key: 1 + leading-zero count of the hash's top
    * 52 bits (the low [[HllP]] bits pick the register). Integer-only:
    * bit-length via `length(bin(w))`, identical in DuckDB; `w = 0` means
    * all 52 bits are zero (rank 53, then capped).
    */
  private def rankOf(w: Column): Column =
    least(when(w === 0L, lit(53)).otherwise(lit(53) - length(bin(w))), lit(RankCap))
      .cast("long")

  /** Non-empty HLL registers of `key` within each `groupCols` cell:
    * `groupCols…, ridx, rmax`. One map-side-combining max aggregate; empty
    * registers are implicit rank 0 ([[hllEstimate]] accounts for them), so
    * a sketch is at most m rows per group at rest.
    */
  def hllSketch(df: DataFrame, key: Column, groupCols: Seq[String] = Nil): DataFrame = {
    val h = Text.md5Hash64(key.cast("string"))
    df.select(
        groupCols.map(col) :+
          h.bitwiseAND(lit(HllM - 1L)).as("ridx") :+
          rankOf(shiftright(h, HllP)).as("rank"): _*)
      .groupBy((groupCols :+ "ridx").map(col): _*)
      .agg(max("rank").as("rmax"))
  }

  /** Merge any number of sketches (stacked register rows, e.g. a read of
    * the persisted per-day sketch table) into one: register-wise max.
    * Associative + idempotent -> order-, slicing-, and replay-proof.
    */
  def hllMerge(registers: DataFrame): DataFrame =
    registers.groupBy("ridx").agg(max("rmax").as("rmax"))

  /** LOG-LINEAR HISTOGRAM SKETCH — the quantile companion to the HLL
    * family, with the same state story: per-partition (e.g. per-day)
    * bucket-count tables persist as a few hundred integer rows, merge by
    * plain count addition (associative/commutative — order- and
    * slicing-proof), and answer any-quantile-any-window questions without
    * rescanning. Buckets for a non-negative LONG measure `u` (callers
    * quantize doubles to fixed-point first — micro-units, the [[Scalars]]
    * discipline):
    *
    *   u < 16: identity buckets (id = u, exact);
    *   else:   8 sub-buckets per octave — id = bitlen(u)*8 + the 3 bits
    *           after the leading one (ids >= 40, disjoint from identity).
    *
    * Every derivation is integer bit arithmetic (`length(bin(u))`, shifts)
    * expressible identically in DuckDB, so histograms and quantile bounds
    * hash-compare EXACTLY across engines — unlike t-digest/KLL, whose
    * float centroids are engine-private. The price of determinism is a
    * fixed 12.5% relative bucket width (vs KLL's tunable rank error); the
    * quantile answer is the [lo, hi) range of the bucket CONTAINING the
    * exact q-th element — guaranteed, not probabilistic.
    */
  def logHistogram(df: DataFrame, measure: Column, groupCols: Seq[String] = Nil): DataFrame =
    df.select(groupCols.map(col) :+ measure.cast("long").as("u"): _*)
      .withColumn("bucket", expr(
        """CASE
             WHEN u < 0 THEN raise_error('Sketches.logHistogram: measure must be non-negative')
             WHEN u < 16 THEN u
             ELSE cast(length(bin(u)) as bigint) * 8 +
                  (shiftright(u, cast(length(bin(u)) as int) - 4) & 7)
           END"""))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge histogram sketches (stacked bucket rows): counts add. */
  def histMerge(hists: DataFrame): DataFrame =
    hists.groupBy("bucket").agg(sum("cnt").as("cnt"))

  /** Inclusive lower / exclusive upper value bound of a bucket id. */
  private def bucketLo(bid: Column): Column =
    when(bid < 16L, bid).otherwise(
      expr("shiftleft(1L, cast(bucket div 8 as int) - 1) " +
        "+ (bucket % 8) * shiftleft(1L, cast(bucket div 8 as int) - 4)"))

  private def bucketHi(bid: Column): Column =
    when(bid < 16L, bid + 1L).otherwise(
      expr("shiftleft(1L, cast(bucket div 8 as int) - 1) " +
        "+ (bucket % 8 + 1) * shiftleft(1L, cast(bucket div 8 as int) - 4)"))

  /** Quantile bounds from one merged histogram: for each `(name, num, den)`
    * fraction, the `[lo, hi)` of the bucket holding the exact
    * `ceil(num/den * n)`-th smallest element — one wide row
    * (`n, <name>_lo, <name>_hi…`). The cumulative pass is a window over
    * the BUCKET TABLE (at most a few hundred rows by construction — a
    * single-partition sort of sketch state, never of data), and the total
    * is a bounded one-row driver read, the two-phase-literal discipline.
    */
  def histQuantileBounds(hist: DataFrame, qs: Seq[(String, Long, Long)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = hist.agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
    val cum = hist
      .withColumn("c", sum("cnt").over(Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("bucket"), col("c"), bucketLo(col("bucket")).as("lo"),
        bucketHi(col("bucket")).as("hi"))
    require(qs.nonEmpty, "histQuantileBounds: need at least one quantile")
    val picks = qs.flatMap { case (name, num, den) =>
      val pos = if (n == 0L) 0L else (n * num + den - 1L) / den
      Seq(
        min(when(col("c") >= pos, col("lo"))).as(s"${name}_lo"),
        min(when(col("c") >= pos, col("hi"))).as(s"${name}_hi"))
    }
    cum.agg(picks.head, picks.tail: _*).withColumn("n", lit(n))
      .select(col("n") +: qs.flatMap { case (name, _, _) =>
        Seq(col(s"${name}_lo"), col(s"${name}_hi")) }: _*)
  }

  /** The GROUPED form of [[histQuantileBounds]], entirely plan-side (no
    * driver literal): per-`groupCols` quantile bounds from grouped
    * histograms. The per-group total rides as a full-range window sum, and
    * `c >= ceil(tot*num/den)` rewrites to the integer cross-multiplication
    * `c*den >= tot*num`, so the pick needs no division at all. Windows
    * partition BY GROUP over bucket rows (hundreds per group at most —
    * sketch state, never data). Output: one row per group,
    * `groupCols…, n, <name>_lo, <name>_hi…`.
    */
  def histQuantileBoundsGrouped(
      hist: DataFrame, groupCols: Seq[String], qs: Seq[(String, Long, Long)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "histQuantileBoundsGrouped: use histQuantileBounds globally")
    require(qs.nonEmpty, "histQuantileBoundsGrouped: need at least one quantile")
    val g = groupCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(g: _*)
    val cum = hist
      .withColumn("c", sum("cnt").over(wCum))
      .withColumn("tot", sum("cnt").over(wTot))
      .select(g :+ col("c") :+ col("tot") :+
        bucketLo(col("bucket")).as("lo") :+ bucketHi(col("bucket")).as("hi"): _*)
    val picks = qs.flatMap { case (name, num, den) =>
      val hit = col("c") * den >= col("tot") * num
      Seq(min(when(hit, col("lo"))).as(s"${name}_lo"),
        min(when(hit, col("hi"))).as(s"${name}_hi"))
    }
    cum.groupBy(g: _*)
      .agg(max("tot").as("n"), picks: _*)
      .select(g ++ (col("n") +: qs.flatMap { case (name, _, _) =>
        Seq(col(s"${name}_lo"), col(s"${name}_hi")) }): _*)
  }

  /** COUNT-MIN SKETCH — frequencies, completing the sketch-state trio
    * (distinct = HLL, quantiles = log-histogram). Unlike Misra–Gries /
    * SpaceSaving, whose counter sets depend on arrival order, count-min is
    * a pure SUM over hash cells: order-independent, mergeable by addition,
    * and — built on [[Text.md5Hash64]] with the row index salted into the
    * hash input — cross-engine-exact cell for cell. State is
    * `CmsD * CmsW = 2048` integer cells per sketch (per day, per source…);
    * a point query reads back `min_i cells[i][h_i(k)]`, which NEVER
    * undercounts and overcounts by more than `e/CmsW * n` per row with
    * probability `1 - e^-CmsD` — on any fixed corpus the overcount is a
    * deterministic, checkable integer (the registry row checks it).
    */
  val CmsD = 4
  val CmsW = 512L

  /** Sketch cells `(groupCols…, r, cell, cnt)` counting occurrences of
    * `key` (not distinct — frequencies): each input row lands in one cell
    * per hash row. The d-fold row explosion happens BEFORE the aggregate,
    * so the shuffle carries at most `d * w` partial cells per input
    * partition, not d copies of the data.
    */
  def cmsSketch(df: DataFrame, key: Column, groupCols: Seq[String] = Nil): DataFrame = {
    val rows = array((0 until CmsD).map(i => lit(i.toLong)): _*)
    df.select(groupCols.map(col) :+ key.cast("string").as("__k"): _*)
      .withColumn("r", explode(rows))
      .select(groupCols.map(col) :+ col("r") :+
        pmod(Text.md5Hash64(concat(col("r").cast("string"), lit(":"), col("__k"))),
          lit(CmsW)).as("cell"): _*)
      .groupBy((groupCols :+ "r" :+ "cell").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge count-min sketches (stacked cell rows): counts add. */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy("r", "cell").agg(sum("cnt").as("cnt"))

  /** Point-query a merged sketch for every key in `keys(k)`: re-derive the
    * d cells per key, join them against the sketch (keyed equi-join on the
    * 2048-row cell table — broadcastable state, never a scan of data), and
    * take the min: `(k, est)`. Keys absent from the sketched corpus get
    * est 0 (their cells may also carry other keys' collisions — count-min
    * still never undercounts).
    */
  def cmsPointQuery(sketch: DataFrame, keys: DataFrame): DataFrame = {
    val rows = array((0 until CmsD).map(i => lit(i.toLong)): _*)
    val probes = keys.select(col("k"))
      .withColumn("r", explode(rows))
      .withColumn("cell",
        pmod(Text.md5Hash64(concat(col("r").cast("string"), lit(":"), col("k").cast("string"))),
          lit(CmsW)))
    probes.join(broadcast(sketch), Seq("r", "cell"), "left_outer")
      .groupBy("k").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** The GROUPED form of [[hllEstimate]]: one estimate per `groupCols`
    * cell from a grouped sketch (`groupCols…, ridx, rmax`), in one
    * map-side-combining aggregate — per-key distinct estimates at 100 TB
    * without a driver loop or a per-key `countDistinct` shuffle of raw
    * data. Identical integer math, identical oracle-expressibility.
    */
  def hllEstimateGrouped(sketch: DataFrame, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "hllEstimateGrouped: use hllEstimate for the global form")
    sketch.groupBy(groupCols.map(col): _*)
      .agg(
        coalesce(sum(expr(s"shiftleft(1L, $RankCap - cast(rmax as int))")), lit(0L)).as("s_ne"),
        count(lit(1)).as("ne"))
      .select(groupCols.map(col) :+
        expr(s"(${AlphaM2}L * shiftleft(1L, $RankCap)) div " +
          s"(($HllM - ne) * shiftleft(1L, $RankCap) + s_ne)").as("est") :+
        (col("ne") < HllM).as("n_low"): _*)
  }

  /** KMV (k-minimum-values) DISTINCT SKETCH — the SET-ALGEBRA member of
    * the sketch-state family. HLL registers merge by max and answer
    * "how many distinct", but two HLL sketches cannot answer "how many
    * SHARED distinct" — intersections need the actual sample. A KMV
    * sketch IS a sample: the `k` smallest distinct [[Text.md5Hash64]]
    * values of the key set. Union = re-min over stacked sketches
    * (associative, idempotent, replay-proof — the same winner-of-winners
    * argument as HLL); intersection = the Jaccard of the merged sample
    * scaled by the union estimate. Everything is 64-bit integer
    * arithmetic on a cross-engine-exact hash, so sketches, merges, AND
    * estimates hash-compare exactly against a SQL oracle.
    *
    * Estimator: with `j = |sketch|` values and `hk` the largest kept,
    * `est = j` exactly when `j < k` (the sketch saw every distinct key),
    * else `floor((k-1) * 2^60 / hk)` — the classic KMV unbiased form over
    * the 60-bit hash space, computed in decimal(38,0) (the numerator
    * 255 * 2^60 overflows a long). Standard error ~ 1/sqrt(k-2) = 6.3%
    * at k = 256.
    *
    * Scale shape: one grouped DISTINCT of hashes (map-side combining),
    * then the map-side-bounded k-heap aggregate
    * ([[org.apache.spark.sql.graftnative.NativeColumns.topKByScore]] with
    * a constant score — ties break to the LOWEST id, so the heap keeps
    * exactly the k smallest hashes with no float anywhere). The exchange
    * carries O(k) rows per group per partition; sketch state at rest is
    * at most k rows per group.
    */
  val KmvK = 256

  /** Sketch rows `(groupCols…, h)`: the [[KmvK]] smallest distinct hash
    * values of `key` per group.
    */
  def kmvSketch(df: DataFrame, key: Column, groupCols: Seq[String] = Nil): DataFrame =
    kmvMin(
      df.select(groupCols.map(col) :+ Text.md5Hash64(key.cast("string")).as("h"): _*)
        .distinct(),
      groupCols)

  /** Merge stacked sketch rows: the k smallest of the union. Idempotent +
    * associative (a re-min of mins), so batch slicing and replay are
    * harmless.
    */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    kmvMin(sketches.dropDuplicates(groupCols :+ "h"), groupCols)

  private def kmvMin(hashes: DataFrame, groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns
    val agg = hashes
      .groupBy(groupCols.map(col): _*)
      .agg(NativeColumns.topKByScore(lit(0.0), col("h"), KmvK).as("__tk"))
    agg.select(groupCols.map(col) :+
      explode(transform(col("__tk"), _.getField("id"))).as("h"): _*)
  }

  /** Distinct estimate per group from sketch rows: `(groupCols…, est,
    * exact)` — `exact` is true when the sketch holds the entire key set
    * (fewer than k values) and `est` is then the exact count.
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__j"), max("h").as("__hk"))
      .select(groupCols.map(col) :+
        when(col("__j") < KmvK, col("__j")).otherwise(
          expr(s"(cast(${KmvK - 1} as decimal(38,0)) * 1152921504606846976) div __hk"))
          .as("est") :+
        (col("__j") < KmvK).as("exact"): _*)

  /** Set algebra over two single-group sketches `a(h)` and `b(h)`: one row
    * `(est_a, est_b, est_union, inter_hits, est_intersection)`. The merged
    * sample K is the k smallest of `a ∪ b`; `inter_hits = |{v ∈ K : v ∈ a
    * ∧ v ∈ b}|` (two semi joins of sketch state — at most k rows a side);
    * the intersection estimate is the Jaccard scale-up `inter_hits *
    * est_union div |K|`, which degrades to the EXACT intersection size
    * when the union fit in the sketch. Integer end to end.
    */
  def kmvIntersect2(a: DataFrame, b: DataFrame): DataFrame = {
    val merged = kmvMerge(a.select("h").unionAll(b.select("h")))
    val hits = merged.join(a.select("h"), Seq("h"), "left_semi")
      .join(b.select("h"), Seq("h"), "left_semi")
    // five one-row scalar frames folded through a tagged union + one
    // global aggregate — a crossJoin of scalars would plan a (sanctioned
    // but pointless) nested-loop join; this shape plans none at all
    def tag(m: String, f: DataFrame, c: String): DataFrame =
      f.select(lit(m).as("m"), col(c).cast("long").as("v"))
    Seq(
      tag("ea", kmvEstimate(a), "est"),
      tag("eb", kmvEstimate(b), "est"),
      tag("eu", kmvEstimate(merged), "est"),
      tag("ih", hits.agg(count(lit(1)).as("n")), "n"),
      tag("kc", merged.agg(count(lit(1)).as("n")), "n"))
      .reduce(_ unionAll _)
      .agg(
        max(when(col("m") === "ea", col("v"))).as("est_a"),
        max(when(col("m") === "eb", col("v"))).as("est_b"),
        max(when(col("m") === "eu", col("v"))).as("est_union"),
        max(when(col("m") === "ih", col("v"))).as("inter_hits"),
        max(when(col("m") === "kc", col("v"))).as("__kc"))
      .select(col("est_a"), col("est_b"), col("est_union"), col("inter_hits"),
        when(col("__kc") === 0L, lit(0L))
          .otherwise(expr("(cast(inter_hits as decimal(38,0)) * est_union) div __kc"))
          .as("est_intersection"))
  }

  /** Raw-HLL estimate from one merged register table (`ridx, rmax`),
    * integer-exact: with every term pre-scaled by `2^RankCap` (legal for
    * any scale >= max rank, and RankCap bounds the rank by construction),
    *
    *   est = floor( alpha*m^2 * 2^RankCap / S ),
    *   S   = (m - |nonempty|) * 2^RankCap + sum_nonempty 2^(RankCap - r_j)
    *
    * — one aggregate, no float, numerator 47072 * 2^40 ~ 5.2e16 << 2^63.
    */
  def hllEstimate(registers: DataFrame): DataFrame =
    registers
      .agg(
        // empty register table (no keys ever sketched): S = m * 2^RankCap,
        // est = floor(alpha*m) = 183 — raw HLL's floor, flagged by n_low
        coalesce(sum(expr(s"shiftleft(1L, $RankCap - cast(rmax as int))")), lit(0L)).as("s_ne"),
        count(lit(1)).as("ne"))
      .select(
        expr(s"(${AlphaM2}L * shiftleft(1L, $RankCap)) div " +
          s"(($HllM - ne) * shiftleft(1L, $RankCap) + s_ne)").as("est"),
        (col("ne") < HllM).as("n_low"))
}
