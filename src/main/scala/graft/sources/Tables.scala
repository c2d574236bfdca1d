package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the engine.
  *
  * The reference lakehouse reads Snappy-Parquet tables registered in a
  * Glue/Athena catalog, partitioned by `year,month`
  * (reference: src/pipelines/raw/defi_events.py:38-45,
  * src/pipelines/stage/ddl/the_graph_historical_account_positions.sql:1-7).
  * In this engine a "table" is a parquet path; Spark's vectorized reader +
  * Catalyst partition pruning / predicate pushdown replace Athena's scan
  * layer. At 100 TB the same call works unchanged on a directory of
  * partitioned parquet: pruning happens on `year=.../month=...`
  * subdirectories and min/max row-group stats.
  */
object Tables {

  /** All driver-provided testdata tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session conf the engine standardizes on (all runtime-settable, so this
    * also works inside a caller-provided SparkSession):
    *  - `nanosAsLong`: the testdata `events.ts` is parquet TIMESTAMP(NANOS),
    *    which Spark's reader rejects as a timestamp; reading it as a nanos
    *    LONG keeps epoch math exact (no ns->us truncation).
    *  - UTC session TZ: reference pins all date semantics to UTC.
    *  - ANSI off: Trino-style null-on-bad-arithmetic semantics; all division
    *    in the engine is explicitly zero-guarded anyway (SURVEY.md §7.4.6).
    */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
