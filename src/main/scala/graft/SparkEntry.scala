package graft

import graft.registry.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory itself lives in [[graft.registry.Registry]]
  * (one Q per SURVEY.md §2 key, each with its DuckDB oracle SQL).
  */
object SparkEntry {

  /** Flagship query (sf0.001 smoke): the full 28-column feature assembly —
    * 10 views + defi_features_calculation.sql semantics over
    * reference-shaped fixtures (graft.features.Views / Assembly).
    */
  def entry(spark: SparkSession): DataFrame =
    registry.FeaturePipeline.assembly(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** DuckDB-equivalent ANSI SQL per query key (omitted where not
    * SQL-expressible, e.g. xxhash64-based MinHash — those get the driver's
    * rows-only check plus scalatest recall coverage).
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Headline subset for Bench (one per operator family). */
  def benchQueries: Seq[String] = Registry.all.filter(_.bench).map(_.name)
}
