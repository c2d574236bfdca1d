package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate: boolean constraint checks evaluated as ONE aggregate
  * over the feature frame, emitted as one row per constraint, with a driver
  * assert that aborts the pipeline before serving — the reference's
  * runtime gate (defi_features_constraints_query.sql:1-51,
  * defi_features_data_quality_pipeline.py:17-33).
  *
  * Shape per constraint: `(constraint: String, is_fail: Boolean)`;
  * `allZero` = share-of-zeros == 100%, `anyNegative` = any value < 0.
  */
object Constraints {

  sealed trait Check { def name: String; def failExpr: Column }

  /** Fails when EVERY row has `c = 0` (the reference's
    * `COUNT(CASE WHEN x=0 THEN 1 END) / COUNT(*) = 1` idiom).
    */
  case class AllZero(name: String, c: Column) extends Check {
    def failExpr: Column =
      (count(when(c === 0, 1)) === count(lit(1))) && count(lit(1)) > 0
  }

  /** Fails when ANY row has `c < 0` (counts must be non-negative). */
  case class AnyNegative(name: String, c: Column) extends Check {
    def failExpr: Column = count(when(c < 0, 1)) > 0
  }

  /** Fails when ANY row has `c` NULL. */
  case class AnyNull(name: String, c: Column) extends Check {
    def failExpr: Column = count(when(c.isNull, 1)) > 0
  }

  /** Evaluate all checks in a single aggregate pass (one job, one shuffle-
    * free reduction), then pivot to the one-row-per-constraint shape the
    * reference's UNION ALL produces.
    */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val agg = df.agg(
      checks.head.failExpr.as(checks.head.name),
      checks.tail.map(ch => ch.failExpr.as(ch.name)): _*)
    val stacked = explode(
      array(checks.map(ch => struct(lit(ch.name).as("constraint"), col(ch.name).as("is_fail"))): _*))
    agg.select(stacked.as("c")).select(col("c.constraint"), col("c.is_fail"))
  }

  /** The runtime gate: throws if any constraint failed
    * (reference: defi_features_data_quality_pipeline.py:24-33).
    */
  def enforce(df: DataFrame, checks: Seq[Check]): Unit = {
    val failed = evaluate(df, checks).filter(col("is_fail")).collect().map(_.getString(0))
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"data-quality constraints failed: ${failed.mkString(", ")}")
  }
}
