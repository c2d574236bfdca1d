package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats beyond parquet. JSONL (one JSON object per line) is
  * the lingua franca of training-data exchange — corpora arrive and ship
  * as .jsonl far more often than as parquet.
  */
object Formats {

  /** Read a JSONL directory with an EXPLICIT schema. Schema inference is
    * deliberately not offered: at corpus scale inference is a full extra
    * pass over 100 TB before the first real job, and a single malformed
    * line can silently widen a column to string for the whole table.
    * `columnNameOfCorruptRecord` rows surface under `_corrupt_record` when
    * the schema includes it; otherwise malformed lines are dropped by
    * `PERMISSIVE` with nulls (callers gate with
    * [[graft.quality.Constraints]] downstream).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Write as JSONL, one object per line per row. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** CSV with the one safe dialect for free-text columns: header on,
    * EVERYTHING quoted, `"` doubled (RFC 4180), so embedded newlines,
    * commas and quotes in document text survive. Readers that split on
    * newlines without a CSV parser will mangle this — that is CSV's
    * nature, and why [[readCsv]] forces `multiLine` (which also means a
    * file is one parse unit: at 100 TB keep individual CSV files modest
    * or land JSONL/parquet instead — multiLine CSV cannot be split at
    * arbitrary byte offsets the way line-delimited formats can).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("quoteAll", "true").option("escape", "\"")
      .csv(path)

  /** Read [[writeCsv]] output with an EXPLICIT schema (same no-inference
    * contract as [[readJsonl]]). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true").option("escape", "\"")
      .csv(path)

  /** Read parquet snapshots whose schemas DRIFTED (a later drop added
    * columns): `mergeSchema` unions the field sets; rows from pre-drift
    * files surface the new columns as null. This is the read posture for
    * a 100 TB lake where a backfill can't rewrite years of partitions —
    * pair with [[graft.quality.Constraints]] to gate on the null rate of
    * late-added columns. Column pruning and filter pushdown still apply
    * per file (each footer is consulted independently).
    */
  def readEvolved(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** ORC, the other columnar lake format (Hive-lineage lakes and
    * Trino/Presto warehouses commonly land it): same columnar posture as
    * parquet — predicate pushdown against stripe/row-group statistics,
    * column pruning, splittable files — so a corpus arriving as ORC reads
    * with the engine's full scan hygiene and needs no conversion pass
    * first. Zstd, the same codec family as the parquet side.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "zstd").orc(path)

  /** Read [[writeOrc]] output with an EXPLICIT schema (the [[readJsonl]]
    * no-inference contract; for ORC the schema also guards against a
    * Hive-written file whose column NAMES drifted to `_col0`-style
    * positions). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
