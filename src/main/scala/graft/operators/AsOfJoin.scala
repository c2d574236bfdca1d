package graft.operators

import graft.plans.AsOfMergeJoinNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** As-of join: match each left row to the latest right row whose ordering
  * key falls in `[leftTs - tolerance, leftTs]`.
  *
  * Reference semantics: the 7-day trailing price lookup
  * (src/pipelines/analytics/transformations/transformations.sql:2-13,44-48):
  * a BETWEEN range join with an equi key, then `MAX(right ts)` per left key,
  * then an equi re-join on the argmax. `BETWEEN` is inclusive on both ends —
  * a price exactly `tolerance` old is still eligible. Ties on the argmax ts
  * produce one output row per tied right row (faithful to the reference's
  * re-join).
  *
  * Scale notes (100 TB): because the join keeps an EQUI key (`keyCols`),
  * Catalyst plans a shuffled hash / sort-merge join with the range predicate
  * as a residual filter — NOT a BroadcastNestedLoopJoin (SURVEY.md §4). The
  * argmax is computed over the DISTINCT (key, leftTs) pairs, so the range
  * join's input is the deduplicated key set, not the full fact table. Skewed
  * hot keys (popular tokens) are split by AQE skew-join; a small right side
  * (daily prices) broadcasts automatically under AQE size estimation.
  */
object AsOfJoin {

  /** @param left           fact rows ("trades"/events)
    * @param right          time-versioned rows ("prices")
    * @param keyCols        equi keys present on BOTH sides, same names
    * @param leftTs         epoch column name on `left`
    * @param rightTs        epoch column name on `right`
    * @param tolerance      max lookback (same unit as ts cols), inclusive
    * @param rightValueCols right columns to carry into the output
    * @param rightPrefix    prefix for carried right columns
    * @return all `left` columns + prefixed right value columns (null where
    *         no right row is in range)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Long,
      rightValueCols: Seq[String],
      rightPrefix: String = "asof_"): DataFrame = {

    val rp = "__r_"
    val rightCols = (keyCols ++ (rightTs +: rightValueCols)).distinct
    val r0 = right.select(rightCols.map(c => col(c).as(rp + c)): _*)

    // Stage 1: argmax of right ts per DISTINCT (keys, leftTs) — mirrors the
    // reference's GROUP BY (epoch_timestamp, token) CTE.
    val lk = left.select((keyCols :+ leftTs).map(col): _*).distinct()
    val rangeCond =
      keyCols.map(k => col(k) === col(rp + k)).reduce(_ && _) &&
        col(rp + rightTs).between(col(leftTs) - tolerance, col(leftTs))
    val maxTs = lk
      .join(r0, rangeCond, "inner")
      .groupBy((keyCols :+ leftTs).map(col): _*)
      .agg(max(col(rp + rightTs)).as("__max_right_ts"))

    // Stage 2: left -> argmax -> right row at the argmax ts (both equi joins).
    val withMax = left.join(maxTs, keyCols :+ leftTs, "left")
    val backCond =
      keyCols.map(k => col(k) === col(rp + k)).reduce(_ && _) &&
        col("__max_right_ts") === col(rp + rightTs)
    withMax
      .join(r0, backCond, "left")
      .select(
        left.columns.map(col) ++
          rightValueCols.map(c => col(rp + c).as(rightPrefix + c)): _*)
  }

  /** FORWARD as-of join — the LABELING primitive a supervised-training
    * pipeline needs next to the backward [[asOf]]: match each left row to
    * the EARLIEST right row with the same keys in
    * `(leftTs, leftTs + horizon]` — strictly AFTER the observation instant
    * (a label that could equal the feature row's own timestamp leaks the
    * present into the target), inclusive at the horizon. Features look
    * back, labels look forward; composing the two around one observation
    * time yields a point-in-time-correct training matrix (see
    * Q:`pipeline_labeled_features`).
    *
    * Same structure and scale shape as [[asOf]] mirrored in time: argmin
    * of right ts over the DISTINCT (keys, leftTs) pairs, equi re-join at
    * the argmin; ties on the argmin ts produce one row per tied right row.
    * The equi keys keep the plan a shuffled hash/sort-merge join (never a
    * nested loop), and the hot-key/binned considerations of [[asOfBinned]]
    * apply identically with the bin arithmetic reflected.
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      horizon: Long,
      rightValueCols: Seq[String],
      rightPrefix: String = "label_"): DataFrame = {
    require(horizon > 0)
    val rp = "__r_"
    val rightCols = (keyCols ++ (rightTs +: rightValueCols)).distinct
    val r0 = right.select(rightCols.map(c => col(c).as(rp + c)): _*)

    val lk = left.select((keyCols :+ leftTs).map(col): _*).distinct()
    val rangeCond =
      keyCols.map(k => col(k) === col(rp + k)).reduce(_ && _) &&
        col(rp + rightTs) > col(leftTs) &&
        col(rp + rightTs) <= col(leftTs) + horizon
    val minTs = lk
      .join(r0, rangeCond, "inner")
      .groupBy((keyCols :+ leftTs).map(col): _*)
      .agg(min(col(rp + rightTs)).as("__min_right_ts"))

    val withMin = left.join(minTs, keyCols :+ leftTs, "left")
    val backCond =
      keyCols.map(k => col(k) === col(rp + k)).reduce(_ && _) &&
        col("__min_right_ts") === col(rp + rightTs)
    withMin
      .join(r0, backCond, "left")
      .select(
        left.columns.map(col) ++
          rightValueCols.map(c => col(rp + c).as(rightPrefix + c)): _*)
  }

  /** NEAREST-direction as-of join (pandas `merge_asof
    * direction='nearest'`): match each left row to the right row whose
    * timestamp is CLOSEST within `± tolerance`, ties between an equally
    * distant past and future row resolving to the PAST (the leakage-safe
    * default: at equal distance, prefer information that was already
    * known). Ties among multiple right rows AT the winning timestamp fan
    * out one row per tied right row ([[asOf]]'s convention).
    *
    * Same two-stage shape as [[asOf]]/[[asOfForward]] merged: one range
    * join over the DISTINCT (keys, leftTs) pairs picks the winning
    * `(|dt|, side)` per pair as an order-free `min(struct)` (exact
    * integer distance; side 0 = past ranks under side 1 = future, which
    * IS the tie rule), then two equi re-joins attach the winning right
    * rows. All equi/range-keyed — never a nested loop; the
    * [[asOfBinned]] hot-key guidance applies with the bin arithmetic
    * reflected on both sides of the window.
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Long,
      rightValueCols: Seq[String],
      rightPrefix: String = "near_"): DataFrame = {
    require(tolerance > 0)
    val rp = "__r_"
    val rightCols = (keyCols ++ (rightTs +: rightValueCols)).distinct
    val r0 = right.select(rightCols.map(c => col(c).as(rp + c)): _*)

    val lk = left.select((keyCols :+ leftTs).map(col): _*).distinct()
    val rangeCond =
      keyCols.map(k => col(k) === col(rp + k)).reduce(_ && _) &&
        col(rp + rightTs).between(col(leftTs) - tolerance, col(leftTs) + tolerance)
    val best = lk
      .join(r0, rangeCond, "inner")
      .groupBy((keyCols :+ leftTs).map(col): _*)
      .agg(min(struct(
        abs(col(rp + rightTs) - col(leftTs)).as("d"),
        when(col(rp + rightTs) <= col(leftTs), 0L).otherwise(1L).as("side"))).as("__b"))
      .select((keyCols :+ leftTs).map(col) :+
        when(col("__b.side") === 0L, col(leftTs) - col("__b.d"))
          .otherwise(col(leftTs) + col("__b.d")).as("__best_right_ts"): _*)

    val withBest = left.join(best, keyCols :+ leftTs, "left")
    val backCond =
      keyCols.map(k => col(k) === col(rp + k)).reduce(_ && _) &&
        col("__best_right_ts") === col(rp + rightTs)
    withBest
      .join(r0, backCond, "left")
      .select(
        left.columns.map(col) ++
          rightValueCols.map(c => col(rp + c).as(rightPrefix + c)): _*)
  }

  /** The NATIVE whole-operator form of [[asOf]]: plans a
    * [[graft.plans.AsOfMergeJoinNode]], which
    * [[graft.plans.AsOfMergeJoinStrategy]] (injected by GraftExtensions)
    * executes as a single sort-merge pass — one exchange per side instead
    * of [[asOf]]'s four-shuffle argmax + re-join composition, no candidate
    * set at all, O(1) merge state per partition. Same backward-inclusive
    * window `[leftTs - tolerance, leftTs]`; null keys/timestamps never
    * match; requires (keys, rightTs) UNIQUE on the right (the versioned-
    * value-table contract — [[asOf]] instead fans out argmax ties, so the
    * two agree exactly on tie-free inputs; AsOfMergeSpec differential-tests
    * that and the registry hash-checks both against one oracle).
    *
    * Requires the session built with
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def asOfMerge(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Long,
      rightValueCols: Seq[String],
      rightPrefix: String = "asof_"): DataFrame =
    buildMerge(left, right, keyCols, leftTs, rightTs, tolerance,
      rightValueCols, rightPrefix, forward = false)

  /** SALTED [[asOfMerge]] — the intervention for the one skew case the
    * plain merge exec cannot absorb: a single key whose sorted history
    * exceeds one task's practical ceiling (AQE's skew splitter does not
    * know the custom exec, and the r8 measurement shows [[asOfBinned]] is
    * never the answer — its hot-cell pairing is quadratic in window
    * density, 25-107 s where the merge runs 0.4 s; tools/AsOfSkewBench).
    *
    * The left side takes a deterministic salt in [0, nSalts) from
    * `saltFrom` (any roughly-unique LEFT column — row identity, not the
    * join key); the right side is replicated once per salt. Each
    * (key, salt) partition then holds a SLICE of the left rows but the
    * key's FULL right history, so every left row still sees exactly the
    * argmax row it would have seen unsalted: result is row-identical to
    * [[asOfMerge]], with the hot key's left side fanned across nSalts
    * tasks. Cost: right shuffle volume × nSalts — size nSalts to the hot
    * key's left-row count, not to taste (same trade as
    * [[Skew.saltedInnerJoin]]).
    */
  def asOfMergeSalted(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Long,
      rightValueCols: Seq[String],
      nSalts: Int,
      saltFrom: String,
      rightPrefix: String = "asof_"): DataFrame = {
    require(nSalts >= 1)
    val salt = "__asof_salt"
    val ls = left.withColumn(salt, pmod(xxhash64(col(saltFrom)), lit(nSalts.toLong)))
    val rs = right.withColumn(salt, explode(sequence(lit(0L), lit(nSalts - 1L))))
    buildMerge(ls, rs, keyCols :+ salt, leftTs, rightTs, tolerance,
      rightValueCols, rightPrefix, forward = false)
      .drop(salt)
  }

  /** [[asOfMerge]] mirrored in time — the native whole-operator form of
    * [[asOfForward]]: each left row matches the EARLIEST right row in
    * `(leftTs, leftTs + horizon]` (open at the observation instant so a
    * label can never leak the present, closed at the horizon). Same
    * one-exchange-per-side plan; the merge PEEKS the first future row
    * instead of consuming it (one future label row can serve many earlier
    * fact rows), so per-partition state is zero.
    */
  def asOfMergeForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      horizon: Long,
      rightValueCols: Seq[String],
      rightPrefix: String = "label_"): DataFrame = {
    require(horizon > 0)
    buildMerge(left, right, keyCols, leftTs, rightTs, horizon,
      rightValueCols, rightPrefix, forward = true)
  }

  private def buildMerge(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Long,
      rightValueCols: Seq[String],
      rightPrefix: String,
      forward: Boolean): DataFrame = {
    // prune + re-alias the right side up front: Catalyst cannot push column
    // pruning through a foreign logical node, and the aliases mint fresh
    // exprIds so self-joins (left and right views of one table) stay
    // unambiguous inside the node
    val rCols = (keyCols ++ (rightTs +: rightValueCols)).distinct
    val r = right.select(rCols.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, side: String)(n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asOfMerge: $side side has no column '$n'"))
    def asLong(a: Attribute): Expression =
      if (a.dataType == LongType) a else Cast(a, LongType)
    val la = attr(lPlan, "left") _
    val ra = attr(rPlan, "right") _
    keyCols.foreach { k =>
      require(la(k).dataType == ra(k).dataType,
        s"asOfMerge: key '$k' differs in type across sides")
    }
    val vals = rightValueCols.map(ra)
    val outVals = vals.map(a =>
      AttributeReference(rightPrefix + a.name, a.dataType, nullable = true)())
    val node = AsOfMergeJoinNode(lPlan, rPlan,
      keyCols.map(la), keyCols.map(ra),
      asLong(la(leftTs)), asLong(ra(rightTs)), tolerance, vals, outVals, forward)
    org.apache.spark.sql.graftnative.NativeColumns.ofRows(left, node)
  }

  /** Time-binned as-of join (SURVEY.md §4 option b).
    *
    * [[asOf]]'s range stage joins every left key row against the key's
    * ENTIRE right-side history and filters the BETWEEN residual afterwards;
    * for hot keys with years of price points that residual input explodes.
    * Here both sides are bucketed into `tolerance`-wide time bins and the
    * range stage equi-joins on (keys, bin) — each right row is replicated
    * into exactly the 2 bins whose left rows could see it, so the
    * candidate set per left row is bounded by two bins of history
    * regardless of how long the key's timeline is.
    *
    * PICK RULE (measured, r8 — tools/AsOfSkewBench over 8× sf0.1 derived
    * trades/prices, tools/logs/asof_skew_r8.log): [[asOfMerge]] beats this
    * form in EVERY regime — 0.33-0.40 s vs 1.0-2.1 s on uniform keys, and
    * 0.39 s vs 107 s when one key holds 90% of both sides at 8× window
    * density (25 s when the hot history is stretched over 8× more bins).
    * "Bounded by two bins" is bounded by DENSITY, not count: a (key, bin)
    * cell pairs all its left rows with all its right rows before the
    * BETWEEN residual prunes, so a skew-hot key with dense history is
    * quadratic per cell no matter how many bins AQE spreads. The merge
    * exec's skew cost is linear in the hot key's rows instead. Use this
    * form only for the tied-right-rows semantics (one output row per tied
    * price — [[asOfMerge]] emits exactly one row per left row) or where
    * SparkSessionExtensions can't be installed — and never on a skewed
    * key with dense per-window history.
    *
    * Result is row-identical to [[asOf]] (the bin pre-filter is implied by
    * the BETWEEN residual; the argmax and re-join stages are unchanged).
    */
  def asOfBinned(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Long,
      rightValueCols: Seq[String],
      rightPrefix: String = "asof_"): DataFrame = {
    require(tolerance > 0)
    val rp = "__r_"
    val rightCols = (keyCols ++ (rightTs +: rightValueCols)).distinct
    val r0 = right.select(rightCols.map(c => col(c).as(rp + c)): _*)

    // a right row at t serves left bins (t div T) and (t div T) + 1
    val rBinned = r0.withColumn("__bin",
      explode(array(expr(s"$rp$rightTs div $tolerance"),
        expr(s"$rp$rightTs div $tolerance") + 1)))
    val lk = left.select((keyCols :+ leftTs).map(col): _*).distinct()
      .withColumn("__lbin", expr(s"$leftTs div $tolerance"))
    val rangeCond =
      keyCols.map(k => col(k) === col(rp + k)).reduce(_ && _) &&
        col("__lbin") === col("__bin") &&
        col(rp + rightTs).between(col(leftTs) - tolerance, col(leftTs))
    // double bin membership can duplicate a candidate; MAX absorbs it
    val maxTs = lk
      .join(rBinned, rangeCond, "inner")
      .groupBy((keyCols :+ leftTs).map(col): _*)
      .agg(max(col(rp + rightTs)).as("__max_right_ts"))

    val withMax = left.join(maxTs, keyCols :+ leftTs, "left")
    val backCond =
      keyCols.map(k => col(k) === col(rp + k)).reduce(_ && _) &&
        col("__max_right_ts") === col(rp + rightTs)
    withMax
      .join(r0, backCond, "left")
      .select(
        left.columns.map(col) ++
          rightValueCols.map(c => col(rp + c).as(rightPrefix + c)): _*)
  }
}
