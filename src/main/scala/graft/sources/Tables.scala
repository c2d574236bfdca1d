package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    *  - `nanosAsLong`: a parquet TIMESTAMP(NANOS) `events.ts` (one of the
    *    physical layouts the generator has shipped) is rejected by Spark's
    *    reader as a timestamp; reading it as a nanos LONG keeps epoch math
    *    exact (no ns->us truncation). See [[tsToNanos]] for the
    *    physical-type normalization.
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

  /** Normalize an `events`-shaped frame so `ts` is ALWAYS an epoch-nanos
    * LONG, whatever the parquet physically stores. The generator has
    * shipped both TIMESTAMP(NANOS) (read as a long via `nanosAsLong`) and
    * timestamp[us] (read as TIMESTAMP_NTZ); the whole engine's epoch math
    * (`ts div 1e9` etc.) is integer-exact on the nanos-long form, so the
    * conversion happens ONCE here rather than per consumer. An NTZ
    * wall-clock cast to TIMESTAMP under the pinned-UTC session resolves to
    * the same instant DuckDB's `epoch_ns(ts)` computes — the shared `ev`
    * oracle CTE (Registry.EV) is physical-type-agnostic the same way.
    * Works on batch and streaming frames alike (pure projection).
    */
  def tsToNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case TimestampNTZType | TimestampType =>
      df.withColumn("ts", nanosCol(col("ts")))
    case dt => throw new IllegalArgumentException(
      s"events.ts must be a long or timestamp, got ${dt.catalogString}")
  }

  /** The column form of [[tsToNanos]]'s conversion: timestamp -> epoch
    * nanos. us->ns is a lossless widening (the us payload times 1000).
    */
  def nanosCol(ts: Column): Column = unix_micros(ts.cast(TimestampType)) * 1000L

  def events(spark: SparkSession, dir: String): DataFrame =
    tsToNanos(load(spark, dir, "events"))
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
