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
}
