package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout control for the 100 TB path: bucketed tables co-locate
  * rows by key AT REST, so every join/aggregation on the bucket key reads
  * pre-partitioned data and skips the shuffle entirely — the Spark-native
  * replacement for the reference's 256-way `address_partition` directory
  * scheme (SURVEY.md §1.4), which only pruned, never co-located.
  *
  * Pattern: land the analytics tables bucketed by wallet once per refresh;
  * the 9-join feature chain then runs shuffle-free on the wallet key
  * (verified by LayoutSpec's no-Exchange plan assertion).
  */
object Layout {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      nBuckets: Int,
      key: String,
      sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // with the default in-memory catalog, a previous JVM's managed-table
    // FILES survive even though the registration didn't — saveAsTable then
    // fails with LOCATION_ALREADY_EXISTS; clear the leftover location
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.split('.').last.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(nBuckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Re-attach bucketed FILES to a (possibly fresh) catalog: the restart
    * story. Bucket metadata lives in the catalog, and with the in-memory
    * catalog a JVM restart forgets it while the bucket-suffixed files
    * survive; a restarted app re-issues this DDL and every join/agg on the
    * key is shuffle-free again (LayoutSpec proves it drop/re-attach).
    * With a persistent metastore this is only needed at first registration.
    *
    * `schemaDdl` is the column list (e.g. `"k BIGINT, v DOUBLE"`) — DDL
    * needs it explicitly since bucketed datasource tables don't infer.
    */
  def attachBucketed(
      spark: SparkSession,
      table: String,
      path: String,
      schemaDdl: String,
      nBuckets: Int,
      key: String,
      sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty) s"SORTED BY (${sortCols.mkString(", ")})" else ""
    spark.sql(s"""CREATE TABLE $table ($schemaDdl) USING PARQUET
      CLUSTERED BY ($key) $sorted INTO $nBuckets BUCKETS
      LOCATION '$path'""")
  }

  /** Write `df` RANGE-CLUSTERED on `rangeCol`: `repartitionByRange` gives
    * each output file a disjoint slice of the key space and the
    * within-partition sort orders rows inside it, so every parquet
    * row-group's min/max stats span a narrow range — a reader filtering
    * `rangeCol BETWEEN a AND b` skips all but the overlapping files/row
    * groups at footer level, before any IO. This is the at-rest layout for
    * monotone scan keys (block number, event time) where bucketing's hash
    * scatter would destroy locality; [[writeBucketed]] remains the choice
    * for equi-JOIN keys.
    *
    * The range boundaries come from Spark's reservoir sample of `df`
    * (one extra pass), so skewed key distributions still yield ~equal-size
    * files — the knob a 100 TB table needs for both pruning AND balanced
    * tasks.
    */
  def writeRangeClustered(
      df: DataFrame,
      path: String,
      nRanges: Int,
      rangeCol: String): Unit =
    df.repartitionByRange(nRanges, org.apache.spark.sql.functions.col(rangeCol))
      .sortWithinPartitions(rangeCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
