package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational operator patterns of the reference, re-expressed Spark-first
  * (SURVEY.md §2.3, §2.6).
  */
object Relational {

  /** N-way `UNION ALL` + outer `DISTINCT` — the wallet-spine pattern
    * (reference: view_distinct_defi_events_addresses.sql:2-33). Each input
    * must be a single-column frame; output column is `outName`.
    *
    * Scale: union is a no-shuffle narrow op; the single shuffle is the final
    * distinct (hash partition on the key). Partial (map-side) distinct makes
    * the shuffle carry unique keys per task only.
    */
  def unionDistinct(outName: String, inputs: Seq[DataFrame]): DataFrame = {
    require(inputs.nonEmpty)
    inputs
      .map(df => df.toDF(outName))
      .reduce(_ union _)
      .distinct()
  }

  /** FULL OUTER join of two per-group aggregate frames on `key`, then
    * COALESCE-merge of the key and of every value column (missing side -> 0)
    * (reference: view_defi_historical_health_and_risk_factor.sql:151-170).
    * Value columns that exist on both sides get `{name}_left`/`{name}_right`
    * suffixes; the caller projects the merge.
    */
  def fullOuterCoalesceKey(
      left: DataFrame,
      right: DataFrame,
      key: String,
      mergedKey: String): DataFrame = {
    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")): _*)
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")): _*)
    l.join(r, col(s"l_$key") === col(s"r_$key"), "full_outer")
      .withColumn(mergedKey, coalesce(col(s"r_$key"), col(s"l_$key")))
  }

  /** Disjunctive theta left-join rewritten as a UNION of two equi joins.
    *
    * The reference writes `LEFT JOIN hf ON (b.account = hf.account OR
    * b.sender = hf.account) AND hf.health_factor < 1.2`
    * (view_defi_historical_count_above_threshold.sql:66-67). Spark would plan
    * the OR as a BroadcastNestedLoopJoin — quadratic at scale — so the engine
    * rewrites it as two shuffled equi joins unioned, which is
    * semantics-preserving for the downstream `COUNT(DISTINCT ...)` because
    * count-distinct collapses the duplicate matches the union introduces
    * (SURVEY.md §7.4.4).
    *
    * @param leftKeys the left columns, any of which may equal `rightKey`
    */
  def disjunctiveLeftJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKey: String,
      extraCond: Column): DataFrame = {
    leftKeys
      .map { k =>
        left.join(right, left(k) === right(rightKey) && extraCond, "left")
      }
      .reduce(_ union _)
  }

  /** "Latest row per group" via the reference's max + `>=` re-join
    * (view_defi_current_health_factor_features.sql:3-32). Deliberately NOT a
    * row_number window: the `>=` re-join can keep >1 row per group (e.g. two
    * protocols sharing a market name at the same block) and the reference
    * depends on that (SURVEY.md §7.4.3).
    */
  def latestPerGroupGeq(df: DataFrame, groupCol: String, orderCol: String): DataFrame = {
    val latest = df.groupBy(groupCol).agg(max(col(orderCol)).as("__max_order"))
    df.join(latest, Seq(groupCol), "inner")
      .filter(col(orderCol) >= col("__max_order"))
      .drop("__max_order")
  }

  /** [[latestPerGroupGeq]] as a single window pass — row-identical (rank()
    * keeps ties at the max, exactly the `>=` semantics). PICK RULE: the
    * agg+join form evaluates `df` TWICE (once for the max, once for the
    * re-join) but only shuffles the tiny per-group max table — right when
    * `df` is a cheap re-scannable source (a parquet scan with pushdown).
    * This window form evaluates `df` ONCE but shuffles ALL of it — right
    * when `df` is a DERIVED plan (an aggregate, a join tree) whose
    * re-evaluation costs more than its shuffle; inside a fanned-out view
    * the agg+join form multiplies the whole upstream plan per reference
    * (the r8 currentHfF profile: 52 scans / 122 aggs for 150 rows).
    */
  def latestPerGroupWindow(df: DataFrame, groupCol: String, orderCol: String): DataFrame =
    df.withColumn("__rk", rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCol).orderBy(col(orderCol).desc)))
      .filter(col("__rk") === 1)
      .drop("__rk")

  /** Left-join a feature frame onto a spine and COALESCE its value columns
    * to a default — one link of the reference's 9-join feature chain
    * (defi_features_calculation.sql:1-138). `distinct` mirrors the
    * reference's SELECT DISTINCT at each step.
    */
  def leftFeatureJoin(
      spine: DataFrame,
      features: DataFrame,
      spineKey: String,
      featureKey: String,
      defaults: Map[String, Column],
      dedup: Boolean = true): DataFrame = {
    // rename the feature key BEFORE joining: when spine and features share
    // lineage (a self-join), Spark re-aliases the right side's attribute
    // ids, so drop(features(featureKey)) would silently no-op and leak a
    // duplicate column into the output
    val fk = s"__fk_$featureKey"
    val f = features.withColumnRenamed(featureKey, fk)
    val joined = spine
      .join(f, spine(spineKey) === f(fk), "left")
      .drop(fk)
    val projected = defaults.foldLeft(joined) { case (df, (c, default)) =>
      df.withColumn(c, coalesce(col(c), default))
    }
    if (dedup) projected.distinct() else projected
  }

  /** Point-in-interval RANGE JOIN with equi keys, bin-replicated: emit
    * every (left, right) pair sharing `keyCols` where
    * `left.pointCol BETWEEN right.loCol AND right.hiCol` (inclusive both
    * ends) — campaign/config-window attribution, block-range versioned
    * lookups, session assignment.
    *
    * Scale shape: Spark plans a naive keyed BETWEEN join as an equi join
    * with a residual filter, so every left row meets the key's ENTIRE
    * interval history before the residual prunes — quadratic per hot key.
    * Here each right interval is replicated into every `binWidth`-wide
    * time bin it overlaps (`sequence(lo div w, hi div w)` — bounded by
    * `span/binWidth + 1` copies) and each left point lands in exactly ONE
    * bin, so the join is a pure (keys, bin) equi join whose candidates per
    * left row are just the intervals overlapping its bin. Because the
    * point belongs to a single bin, each qualifying pair is emitted
    * exactly once — no post-dedup. Choose `binWidth` near the typical
    * interval span: replication stays ~2x while candidate lists stay
    * local. Inner join only (unmatched left rows are a left-anti away).
    *
    * Output: all `left` columns + `rightPrefix`-prefixed lo/hi/value
    * columns.
    */
  def rangeJoinBinned(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      rightValueCols: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val rp = "__r_"
    val rCols = (keyCols ++ Seq(loCol, hiCol) ++ rightValueCols).distinct
    val r = right.select(rCols.map(c => col(c).as(rp + c)): _*)
      .filter(col(rp + loCol) <= col(rp + hiCol))
      .withColumn("__bin", explode(sequence(
        expr(s"$rp$loCol div $binWidth"), expr(s"$rp$hiCol div $binWidth"))))
    val l = left.withColumn("__bin", expr(s"$pointCol div $binWidth"))
    val cond = keyCols.map(k => col(k) === col(rp + k)).reduce(_ && _) &&
      col("__bin") === col(s"${rp}__bin_probe") &&
      col(pointCol).between(col(rp + loCol), col(rp + hiCol))
    l.join(r.withColumnRenamed("__bin", s"${rp}__bin_probe"), cond, "inner")
      .select(left.columns.map(col) ++
        (Seq(loCol, hiCol) ++ rightValueCols).distinct
          .map(c => col(rp + c).as(rightPrefix + c)): _*)
  }

  /** INTERVAL-overlap join — the interval×interval sibling of
    * [[rangeJoinBinned]]'s point×interval: emit each (left, right) pair
    * whose CLOSED intervals intersect
    * (`l.lo <= r.hi AND r.lo <= l.hi`) — concurrent-session analytics,
    * conflicting-lease detection, validity-window reconciliation
    * against an SCD2 table ([[Cdc.scd2Intervals]]).
    *
    * Scale shape: Spark plans the naive inequality pair as a nested loop
    * (quadratic). Here BOTH sides replicate into every `binWidth`-wide
    * bin their interval touches, candidates meet as a pure bin equi join,
    * and the classic once-only rule dedups WITHOUT a distinct: a
    * qualifying pair is kept only in the FIRST bin where both intervals
    * are present — `max(l.lo, r.lo) div binWidth` — so each pair is
    * emitted exactly once, no post-shuffle dedup of the replicated
    * matches. Replication is `span/binWidth + 1` copies per row; choose
    * `binWidth` near the typical interval span ([[rangeJoinBinned]]'s
    * guidance verbatim).
    *
    * The join is intentionally unkeyed-beyond-the-bin when `keyCols` is
    * empty (cross-key overlap IS the question, e.g. "which other users'
    * sessions ran concurrently"); pass keys to scope it. Output: all left
    * columns + `rightPrefix`-prefixed right lo/hi/value columns.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      loCol: String,
      hiCol: String,
      binWidth: Long,
      rightValueCols: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val rp = "__r_"
    val rCols = (keyCols ++ Seq(loCol, hiCol) ++ rightValueCols).distinct
    val r = right.select(rCols.map(c => col(c).as(rp + c)): _*)
      .filter(col(rp + loCol) <= col(rp + hiCol))
      .withColumn("__bin", explode(sequence(
        expr(s"$rp$loCol div $binWidth"), expr(s"$rp$hiCol div $binWidth"))))
    val l = left
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        expr(s"$loCol div $binWidth"), expr(s"$hiCol div $binWidth"))))
    val cond = keyCols.map(k => col(k) === col(rp + k)).foldLeft(
        col("__bin") === col(s"${rp}__bin"))(_ && _) &&
      col(loCol) <= col(rp + hiCol) && col(rp + loCol) <= col(hiCol) &&
      // once-only: keep the pair only in the first shared bin (`div`, not
      // `/`: an epoch-nanos long exceeds a double mantissa)
      col("__bin") === expr(s"greatest($loCol, $rp$loCol) div $binWidth")
    l.join(r.withColumnRenamed("__bin", s"${rp}__bin"), cond, "inner")
      .select(left.columns.map(col) ++
        (Seq(loCol, hiCol) ++ rightValueCols).distinct
          .map(c => col(rp + c).as(rightPrefix + c)): _*)
  }

  /** Bloom-runtime-filtered equi join — the hand-placed form of Spark's
    * runtime row-group filtering for the case the optimizer can't see: a
    * BIG probe side shuffle-joining a SELECTIVE-but-not-broadcastable
    * build side. A Bloom filter over the build side's join keys (built
    * distributed by the same native aggregate as
    * [[Dedup.exactIngestBloom]]) is applied to the probe side BEFORE its
    * shuffle, so rows that cannot match never cross the wire — at 100 TB
    * the shuffle-write volume drops by the probe side's miss rate, which for a
    * selective build side is nearly all of it.
    *
    * The result is EXACT (identical to the plain inner join): the Bloom
    * has no false negatives, and false positives are eliminated by the
    * real join that follows — fpp only costs shuffled bytes, never rows.
    * Size `numBits` for the build side's distinct-key count (~10 bits/key
    * ≈ 1% fpp); the filter itself is `numBits/8` bytes broadcast once.
    *
    * Build-side contract: selective enough that its key set fits one
    * Bloom filter (a few GB ceiling — beyond that, shard by key prefix),
    * but too large / too wide to broadcast-hash-join outright, which is
    * precisely the regime where Spark would otherwise shuffle both sides
    * in full. The bloom build is one tiny aggregate action (the
    * snk_range_clustered two-phase literal discipline).
    */
  def bloomFilteredJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long,
      numBits: Long): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns
    // Hash both sides through ONE common type. The equi-join itself would
    // coerce mismatched key types (int vs bigint, differing decimal scales)
    // and still match, but xxhash64 over the RAW columns would then hash
    // different representations — a false NEGATIVE that silently drops
    // matching rows, violating the EXACT contract above.
    val bigT = big.schema(bigKey).dataType
    val smallT = small.schema(smallKey).dataType
    val common = if (bigT == smallT) bigT
      else org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findWiderTypeForTwo(bigT, smallT)
        .getOrElse(throw new IllegalArgumentException(
          s"bloomFilteredJoin: join keys have incompatible types $bigT vs $smallT"))
    val joined = big.join(small, big(bigKey) === small(smallKey), "inner")
    // the filter build is an aggregate ACTION: a materialization boundary
    // for the derived planView contract (the returned plan carries the
    // bloom as an opaque broadcast literal)
    Boundary.recordExternal()
    val bloom = small
      .agg(NativeColumns.bloomFilterAgg(
        xxhash64(col(smallKey).cast(common)), expectedItems, numBits))
      .head().getAs[Array[Byte]](0)
    if (bloom == null) return joined.limit(0) // empty build side: empty inner join
    val bloomBc = big.sparkSession.sparkContext.broadcast(bloom)
    big
      .filter(NativeColumns.mightContainBroadcast(bloomBc, xxhash64(col(bigKey).cast(common))))
      .join(small, col(bigKey) === small(smallKey), "inner")
  }
}
