package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Population Stability Index between two snapshots of a binned
    * distribution — the train-vs-serving drift monitor every scoring
    * pipeline runs (PSI > 0.25 is the classic retrain alarm; the
    * boolean [[Check]]s above catch broken data, PSI catches data that is
    * valid but no longer looks like what the model saw).
    *
    * `PSI = Σ_bins (p_i - q_i) · ln(p_i / q_i)` with Laplace-smoothed
    * shares `p_i = (n_i + 1) / (N + B)` (B = bins present in either
    * snapshot) so empty bins contribute finitely — the standard epsilon
    * made RATIONAL and hence engine-exact. Each bin's term quantizes once
    * (`floor(term · 1e9)` — ln via log2/log2(e) would double-round, so
    * the natural log is taken directly; one transcendental per bin, the
    * tfidf/surprisal residual-assumption note applies) and the total is
    * an exact integer sum.
    *
    * Output: one row per bin `(bin, n_expected, n_actual, p, q, term_u)`
    * plus the constant `psi` column (Σ term_u / 1e9). Shape: two keyed
    * count aggregations + one full-outer on the bin id; the totals and
    * bin count ride WINDOWS over the (tiny) per-bin frame — no driver
    * scalars, no second pass over either snapshot.
    */
  def driftPsi(expected: DataFrame, actual: DataFrame, binCol: String): DataFrame =
    driftPsiFromCounts(
      expected.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("n_expected")),
      actual.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("n_actual")))

  /** [[driftPsi]] over PRE-AGGREGATED `(bin, n_*)` count frames — the form
    * persisted state feeds (e.g. [[graft.streaming.Streams.driftState]]'s
    * accumulated serving counts vs a frozen training snapshot).
    */
  def driftPsiFromCounts(expectedCounts: DataFrame, actualCounts: DataFrame): DataFrame = {
    val e = expectedCounts
    val a = actualCounts
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val joined = e.join(a, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_expected"), lit(0L)).as("n_expected"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"))
      .withColumn("__te", sum(col("n_expected")).over(w))
      .withColumn("__ta", sum(col("n_actual")).over(w))
      .withColumn("__b", count(lit(1)).over(w))
    joined
      .withColumn("p", (col("n_expected") + 1L).cast("double") /
        (col("__te") + col("__b")).cast("double"))
      .withColumn("q", (col("n_actual") + 1L).cast("double") /
        (col("__ta") + col("__b")).cast("double"))
      .withColumn("term_u", floor((col("p") - col("q")) * log(col("p") / col("q"))
        * lit(1e9)).cast("long"))
      .withColumn("psi", (sum(col("term_u")).over(w)).cast("double") / lit(1e9))
      .drop("__te", "__ta", "__b")
  }

  /** Chi-squared independence audit of two categorical columns — the
    * classic "did the label distribution shift with the slice" test
    * beside [[driftPsi]] (PSI grades one distribution against a frozen
    * snapshot; chi² asks whether two dimensions of ONE table are
    * independent, e.g. event type × weekday, label × data source).
    * Output: one row — `(chi2, dof, n, n_rows_dim, n_cols_dim)` — graded
    * against the chi² critical value by the caller.
    *
    * Determinism: observed counts are exact; expecteds
    * `row_tot · col_tot / N` and the per-cell `(o−e)²/e` terms are
    * mirrored IEEE doubles; each term floor-quantizes to integer
    * microunits BEFORE the final sum ([[graft.functions.Scalars.davgQ]]'s
    * rule), so the statistic is an exact integer sum divided once.
    *
    * Scale shape: one keyed aggregation to the ≤|A|·|B| contingency
    * frame; the row/col/grand totals and the distinct-value counts all
    * ride windows over that tiny frame — raw data is touched once.
    */
  def chiSquaredIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val full = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
      .withColumn("__rt", sum("__o").over(Window.partitionBy("__a")))
      .withColumn("__ct", sum("__o").over(Window.partitionBy("__b")))
      .withColumn("__n", sum("__o").over(full))
      .withColumn("__e", col("__rt").cast("double") * col("__ct").cast("double")
        / col("__n").cast("double"))
      .withColumn("__t", (col("__o").cast("double") - col("__e")) *
        (col("__o").cast("double") - col("__e")) / col("__e"))
    cells.agg(
      (sum(floor(col("__t") * lit(1e6) + lit(0.5)).cast("long")).cast("double") / lit(1e6))
        .as("chi2"),
      ((countDistinct(col("__a")) - 1L) * (countDistinct(col("__b")) - 1L)).as("dof"),
      max(col("__n")).as("n"),
      countDistinct(col("__a")).as("n_rows_dim"),
      countDistinct(col("__b")).as("n_cols_dim"))
  }

  /** k-anonymity audit over quasi-identifier columns — the privacy gate a
    * training-data release pipeline runs next to [[graft.functions.Text
    * .redactPii]]: every combination of quasi-identifier values (the
    * equivalence class) must cover at least `k` distinct subjects, or a
    * released row in that class re-identifies its subject by linkage
    * (Sweeney 2002). Output: one row per equivalence class —
    * `(quasi…, n_subjects, n_rows, violating)` with
    * `violating = n_subjects < k` — so the caller can gate on
    * `violating` (fail the release), suppress the violating classes, or
    * generalize the quasi columns and re-audit.
    *
    * Exact by construction (one count-distinct aggregation); scale shape:
    * a single keyed exchange on the quasi columns; the distinct-subject
    * count partial-aggregates map-side. Classes, not rows, come back —
    * the audit output is bounded by the quasi-space cardinality.
    */
  def kAnonymityReport(
      df: DataFrame, quasiCols: Seq[String], subjectCol: String, k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, "k must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(subjectCol)).as("n_subjects"),
        count(lit(1)).as("n_rows"))
      .withColumn("violating", col("n_subjects") < k)
  }
}
