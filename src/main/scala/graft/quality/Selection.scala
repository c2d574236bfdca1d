package graft.quality

import org.apache.spark.sql.DataFrame
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
}
