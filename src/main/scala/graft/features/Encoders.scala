package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical feature encoders for model-training tables. The reference
  * pipeline ships raw and lightly-derived numeric features
  * (`/root/reference/src/pipelines/features/defi_features.py` shapes); a
  * training-data engine also has to turn high-cardinality categoricals
  * into leakage-safe numerics at corpus scale — the classic target
  * (mean) encoding family, in its leave-one-out form so a row never sees
  * its own label (the encoding leak that silently inflates offline
  * metrics).
  */
object Encoders {

  /** Default ceiling on the per-group stats frame a fact-table join will
    * broadcast: 1M rows of (group, two doubles) is tens of MB — inside
    * every practical driver/executor broadcast budget.
    */
  val DefaultMaxBroadcastGroups: Int = 1000000

  /** Left-join the ≤|groups| stats frame onto the fact table, broadcasting
    * ONLY when its cardinality fits the declared bound — ENFORCED, not a
    * doc contract: a high-cardinality group column (per-user at corpus
    * scale) silently OOMing the broadcast was the failure mode. The probe
    * is a `limit(max+1).count()` — it early-outs at max+1 rows, so the
    * guard never pays for the full cardinality. Past the bound the join
    * falls back to a plain shuffle join (the [[graft.quality.Scoring]]
    * `broadcastBigrams` escape-hatch discipline, automated) — identical
    * results, EncodersSpec-asserted.
    */
  private def joinStats(
      fact: DataFrame, stats: DataFrame, key: String, maxBroadcast: Int): DataFrame = {
    require(maxBroadcast >= 1 && maxBroadcast < Int.MaxValue,
      "maxBroadcast must be in [1, Int.MaxValue)")
    val fits = stats.select(col(key)).limit(maxBroadcast + 1).count() <= maxBroadcast
    fact.join(if (fits) broadcast(stats) else stats, Seq(key), "left")
  }

  /** Leave-one-out target encoding with an m-estimate smoothed variant
    * (Micci-Barreca 2001): for each row, the mean label of its category
    * EXCLUDING the row itself —
    *
    *   enc_loo    = (sum_cat − y) / (n_cat − 1)            (null if alone)
    *   enc_smooth = ((sum_cat − y) + m·prior) / (n_cat − 1 + m)
    *
    * with `prior` the global label mean; rows with a NULL label take the
    * plain category mean (they contributed nothing, so there is nothing
    * to leave out). Smoothing shrinks rare categories toward the prior —
    * the variance control that makes target encoding usable on
    * heavy-tailed categorical distributions.
    *
    * Determinism: category sums accumulate in decimal(38,6) (exact,
    * order-independent), the self-label subtracts in decimal, and only
    * the final quotient runs in doubles with a mirrored expression tree —
    * so an external engine reproduces every encoded value bit-for-bit.
    *
    * Scale shape: one keyed aggregation over the category column (map-
    * side partial), a ≤|categories|-row broadcast back onto the fact
    * table, and a 1-row broadcast for the prior — the corpus itself is
    * never shuffled. The broadcast is GUARDED, not assumed: past
    * `maxBroadcastCats` distinct categories the stats join automatically
    * degrades to a shuffle join (identical results) instead of OOMing.
    * Output: all input columns + `n_cat`, `enc_loo`, `enc_smooth`.
    */
  def targetEncodeLoo(
      df: DataFrame, catCol: String, labelCol: String, m: Long,
      maxBroadcastCats: Int = DefaultMaxBroadcastGroups): DataFrame = {
    require(m >= 0, "smoothing m must be >= 0")
    val yDec: Column = col(labelCol).cast("decimal(38,6)")
    // the global prior rides an unpartitioned window over the tiny stats
    // frame (≤|categories| rows) — sums of exact decimal partials ARE the
    // global decimal sums, and no 1-row crossJoin (nested-loop) is needed
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val stats = df.groupBy(col(catCol))
      .agg(sum(yDec).as("__sum"), count(col(labelCol)).as("__n"))
      .withColumn("__prior", sum("__sum").over(w).cast("double") / sum("__n").over(w))
    val loo = yDec.isNotNull // self leaves the stats only when it entered them
    val num = when(loo, col("__sum") - yDec).otherwise(col("__sum")).cast("double")
    val den = when(loo, col("__n") - 1L).otherwise(col("__n"))
    joinStats(df, stats, catCol, maxBroadcastCats)
      .withColumn("n_cat", coalesce(col("__n"), lit(0L)))
      .withColumn("enc_loo", when(den > 0L, num / den.cast("double")))
      .withColumn("enc_smooth",
        when(den + m > 0L,
          (num + lit(m.toDouble) * col("__prior")) / (den + m).cast("double")))
      .drop("__sum", "__n", "__prior")
  }

  /** Equal-frequency (quantile) binning of an integer-unit measure —
    * `bin ∈ 1..nBins` with cut point k at the percentile-disc position
    * `ceil(n·k/nBins)` (the smallest value whose cumulative count reaches
    * it), assignment `1 + Σ_k [u > cut_k]`. All-integer, so cuts and bin
    * labels are bit-identical on any engine — callers quantize doubles to
    * units first (the repo-wide micro-unit discipline).
    *
    * Scale shape: the cut derivation runs on the DISTINCT-VALUE count
    * table, not the rows — one keyed aggregation, then a cumulative
    * window over that table (unpartitioned, but bounded by the unit
    * domain's distinct cardinality, the [[graft.functions.Sketches
    * .logHistogram]] quantile row's posture; for an unbounded domain,
    * bin on the log-histogram's bucket quantiles instead). Cuts stay
    * IN-PLAN as a 1-row broadcast; the fact table is never shuffled.
    * Null measures get a null bin.
    */
  def quantileBinEqualFreq(df: DataFrame, unitCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    import org.apache.spark.sql.expressions.Window
    // total count rides the same distinct-unit frame as the cumulative
    // (an unpartitioned full-range window over ≤|distinct units| rows)
    val fullW = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // normalize the unit column to LONG up front: "integer-unit measure"
    // admits int/short inputs, whose min() would keep the narrow type and
    // make the row.getLong cut read throw ClassCastException at runtime
    val cum = df.select(col(unitCol).cast("long").as("__u")).filter(col("__u").isNotNull)
      .groupBy("__u").agg(count(lit(1)).as("__c"))
      .withColumn("__cv", sum("__c").over(Window.orderBy("__u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__c").over(fullW))
    val cutAggs = (1 until nBins).map { k =>
      min(when(col("__cv") >= expr(s"(__n * $k + ${nBins - 1}) div $nBins"),
        col("__u"))).as(s"__cut$k")
    }
    // cuts land as PLAN LITERALS via one tiny aggregate action (the
    // snk_range_clustered / loghist-quantile two-phase discipline): a
    // joined-in 1-row frame would plan a nested-loop join, and literals
    // additionally let Catalyst push bin predicates into the scan
    val row = cum.agg(cutAggs.head, cutAggs.tail: _*).head()
    val bin =
      if (row.isNullAt(0)) lit(null).cast("int") // empty input: no cuts, null bins
      else (1 until nBins).foldLeft(lit(1)) { (acc, k) =>
        acc + (col(unitCol) > lit(row.getLong(k - 1))).cast("int")
      }
    df.withColumn("bin", bin)
  }

  /** Per-group simple linear regression (OLS) of `y` over an integer `x`
    * (typically epoch seconds): the classic trend feature —
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, intercept reported AT
    * THE GROUP'S EARLIEST x (x is shifted by the per-group minimum first:
    * slope is shift-invariant, the shift keeps every cross-engine sum in
    * small magnitudes, and "level at the first observation" is the
    * meaningful anchor for a trend feature anyway).
    *
    * Determinism: shifted x is exact integer; Σx/Σx² accumulate in
    * decimal(38,0), Σy in decimal(38,6), and Σxy through the microunit
    * floor quantization into a decimal accumulator ([[graft.functions
    * .Scalars.davgQ]]'s tie rule — a long accumulator would overflow at
    * Σ|x·y|·1e6). The closed-form quotients then run in doubles with a
    * mirrored expression tree. Degenerate groups (all x equal) get null
    * slope/intercept.
    *
    * Scale shape: the min-shift window and the aggregation share the
    * group-key exchange (Catalyst reuses it — the sessionize pattern);
    * output is one row per group.
    */
  def linearTrend(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("__x", col(xCol).cast("long") - min(col(xCol).cast("long")).over(w))
    val x = col("__x")
    val y = col(yCol)
    val sxyQ = sum(floor(x.cast("double") * y * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6)
    val agg = base.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(x.cast("decimal(38,0)")).cast("double").as("__sx"),
      sum((x * x).cast("decimal(38,0)")).cast("double").as("__sxx"),
      sum(y.cast("decimal(38,6)")).cast("double").as("__sy"),
      sxyQ.as("__sxy"),
      min(col(xCol).cast("long")).as("x_min"))
    val nD = col("n").cast("double")
    val den = nD * col("__sxx") - col("__sx") * col("__sx")
    val slope = (nD * col("__sxy") - col("__sx") * col("__sy")) / den
    agg
      .withColumn("slope", when(den =!= 0.0, slope))
      .withColumn("intercept",
        when(den =!= 0.0, (col("__sy") - slope * col("__sx")) / nD))
      .drop("__sx", "__sxx", "__sy", "__sxy")
  }

  /** Per-group ROBUST scaling — `r = (x − median) / IQR` — the
    * outlier-immune sibling of [[standardize]] (one 1e9 sentinel value
    * shifts a z-score's mean/var arbitrarily; it moves a median/IQR not
    * at all, which is why robust scaling is the default for heavy-tailed
    * telemetry features). All three quantiles are DISCRETE picks
    * (smallest value whose rank reaches `ceil(q·n)`): verbatim input
    * doubles, so only the final subtract/divide runs in mirrored IEEE
    * arithmetic — cross-engine exact with no decimal machinery. Ties in
    * `value` leave the picked VALUE deterministic regardless of
    * row_number tie order, so no tiebreak column is needed. Degenerate
    * groups (IQR = 0) and null values get a null `r`.
    *
    * Scale shape: one per-group window pass (rank + count share the
    * exchange), conditional-aggregation to a ≤|groups| stats frame,
    * joined back under the same cardinality guard as the other encoders.
    */
  def robustScale(df: DataFrame, groupCol: String, valueCol: String,
      maxBroadcastGroups: Int = DefaultMaxBroadcastGroups): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    def pick(q: Int) =
      max(when(expr(s"__rn = (__n * $q + 99) div 100"), col(valueCol)))
    val stats = ranked.groupBy(col(groupCol)).agg(
      pick(25).as("__p25"), pick(50).as("__p50"), pick(75).as("__p75"))
    joinStats(df, stats, groupCol, maxBroadcastGroups)
      .withColumn("p50", col("__p50"))
      .withColumn("iqr", col("__p75") - col("__p25"))
      .withColumn("r", when(
        col(valueCol).isNotNull && col("__p75") > col("__p25"),
        (col(valueCol) - col("__p50")) / (col("__p75") - col("__p25"))))
      .drop("__p25", "__p50", "__p75")
  }

  /** Per-group z-score standardization: `z = (x − mean) / sqrt(var)` with
    * mean and POPULATION variance derived from exact order-independent
    * sums — the decimal cast for Σx, the microunit floor-quantization for
    * Σx² ([[graft.functions.Scalars.dsumQ]]; a squared double cast
    * straight to decimal hits the half-microunit tie hazard davgQ
    * documents). The final chain runs in doubles, which stays
    * cross-engine exact because IEEE 754 requires sqrt CORRECTLY ROUNDED
    * (unlike log/exp — no residual assumption here): identical variance
    * in ⇒ identical z out, bit for bit.
    *
    * Degenerate groups (var ≤ 0: constant or singleton) and null values
    * get a null z rather than a NaN that would poison downstream
    * aggregation. Scale shape: one keyed aggregation to ≤|groups| rows,
    * broadcast back — the fact table never shuffles. As in
    * [[targetEncodeLoo]], the broadcast is guarded: past
    * `maxBroadcastGroups` the stats join falls back to a shuffle join.
    */
  def standardize(df: DataFrame, groupCol: String, valueCol: String,
      maxBroadcastGroups: Int = DefaultMaxBroadcastGroups): DataFrame = {
    import graft.functions.Scalars
    val x = col(valueCol)
    val stats = df.groupBy(col(groupCol)).agg(
      (Scalars.dsum(x) / count(x)).as("__mean"),
      ((Scalars.dsumQ(x * x) - Scalars.dsum(x) * Scalars.dsum(x) / count(x)) / count(x))
        .as("__var"))
    joinStats(df, stats, groupCol, maxBroadcastGroups)
      .withColumn("z", when(x.isNotNull && col("__var") > 0.0,
        (x - col("__mean")) / sqrt(col("__var"))))
      .drop("__mean", "__var")
  }
}
