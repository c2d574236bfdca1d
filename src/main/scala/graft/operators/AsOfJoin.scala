package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
