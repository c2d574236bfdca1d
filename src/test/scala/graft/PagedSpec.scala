package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.sources.Paged
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The paged DSv2 connector: partition planning mirrors each pagination
  * protocol, pruning/pushdown actually prune, and the readers are total on
  * transport garbage. The four `src_*` registry rows verify VALUES against
  * the DuckDB oracle; this spec verifies the PLANS and edge behavior the
  * oracle can't see.
  */
class PagedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = s"target/tmp/pagedspec_$name"

  private def events(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, 1000L + i, i.toLong % 7, s"t${i % 3}", i * 1.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  private val DDL =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"

  private def read(root: String, mode: String, ddl: String = DDL,
      more: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(Paged.FORMAT)
      .option("path", root).option("mode", mode).option("schema", ddl)
    more.foreach { case (k, v) => r.option(k, v) }
    r.load()
  }

  private def scanPartitions(df: DataFrame): Int = df.rdd.getNumPartitions

  private def scanReadSchema(df: DataFrame): Seq[String] = {
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    scans.head.scan.readSchema().fieldNames.toSeq
  }

  test("offset mode: one input partition per page, page assignment round-trips") {
    val root = tmp("offset")
    val n = Paged.serveOffsetPages(events(250), Seq("ts", "event_id"), 100, root)
    assert(n == 3)
    val df = read(root, "offset")
    assert(scanPartitions(df) == 3)
    val rows = df.collect()
    assert(rows.length == 250)
    // ordered by ts => event_id i lands on page (i-1)/100
    assert(rows.forall(r => r.getAs[Long]("_page") == (r.getAs[Long]("event_id") - 1) / 100))
  }

  test("offset mode: column pruning reaches the scan (and the _page provenance col prunes too)") {
    val root = tmp("offset") // reuse pages from the previous test
    val df = read(root, "offset").select("event_id", "value")
    assert(scanReadSchema(df) == Seq("event_id", "value"))
    assert(df.agg(sum("event_id")).head.getLong(0) == 250L * 251 / 2)
  }

  test("offset mode: empty source serves zero pages and reads back as an empty typed frame") {
    val root = tmp("offset_empty")
    assert(Paged.serveOffsetPages(events(10).where(lit(false)), Seq("ts"), 100, root) == 0)
    val df = read(root, "offset")
    assert(df.columns.toSeq == Seq("event_id", "ts", "user_id", "event_type", "value", "_page"))
    assert(df.count() == 0)
  }

  test("snapshot mode: one partition per block, _block provenance matches the dir") {
    val root = tmp("snap")
    val snap = Seq((10L, "a", 1.0), (10L, "b", 2.0), (20L, "a", 3.0))
      .toDF("block", "event_type", "last_value")
    val blocks = Paged.serveSnapshotPages(snap, "block", root)
    assert(blocks == Seq(10L, 20L))
    val df = read(root, "snapshot", "event_type STRING, last_value DOUBLE")
    assert(scanPartitions(df) == 2)
    val got = df.select("_block", "event_type", "last_value").as[(Long, String, Double)]
      .collect().toSet
    assert(got == Set((10L, "a", 1.0), (10L, "b", 2.0), (20L, "a", 3.0)))
  }

  test("keyset mode: the cursor chain reproduces the full ordered table with correct steps") {
    val root = tmp("keyset")
    val steps = Paged.serveKeysetPages(events(250), "event_id", batchSize = 60, nAliases = 6, root = root)
    assert(steps == 5) // ceil(250/60)
    val df = read(root, "keyset", DDL + ", alias_idx BIGINT", Map("cursorField" -> "event_id"))
    assert(scanPartitions(df) == 1) // sequential by protocol
    val rows = df.collect()
    assert(rows.length == 250)
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      assert(r.getAs[Long]("_step") == (id - 1) / 60)
      assert(r.getAs[Long]("alias_idx") == ((id - 1) % 60) / 10)
    }
  }

  test("keyset mode: works when the cursor field is pruned out of the query") {
    val root = tmp("keyset")
    val df = read(root, "keyset", DDL + ", alias_idx BIGINT", Map("cursorField" -> "event_id"))
      .select("user_id", "_step")
    // the reader still parses event_id internally to drive the chain
    assert(df.count() == 250)
    assert(df.where(col("_step") === 4).count() == 10) // last partial batch: 250-240
  }

  test("bucketed mode: an isin filter pushes down and prunes untouched buckets") {
    val root = tmp("bucket")
    Paged.serveBucketedPages(events(256), "user_id", nBuckets = 8, root = root)
    // user_id in {3} lives in bucket 3 only -> 1 of 8 bucket dirs read
    val df = read(root, "bucketed", DDL, Map("cursorField" -> "user_id"))
      .where(col("user_id") === 3L)
    assert(scanPartitions(df) == 1, "EqualTo pushdown should plan exactly one bucket")
    assert(df.count() == events(256).where(col("user_id") === 3L).count())
    // multi-address In within two buckets -> two partitions
    val df2 = read(root, "bucketed", DDL, Map("cursorField" -> "user_id"))
      .where(col("user_id").isin(1L, 2L))
    assert(scanPartitions(df2) == 2)
    assert(df2.count() == events(256).where(col("user_id").isin(1L, 2L)).count())
  }

  test("bucketed mode: address chunks cap at chunkSize per partition (the 1000-address request limit)") {
    val root = tmp("bucket1")
    Paged.serveBucketedPages(events(40), "user_id", nBuckets = 1, root = root)
    val addrs = (0L to 6L).mkString(",")
    val df = read(root, "bucketed", DDL,
      Map("cursorField" -> "user_id", "addresses" -> addrs, "chunkSize" -> "3"))
    assert(scanPartitions(df) == 3) // ceil(7/3) chunks of one bucket
    assert(df.count() == 40)        // all user_ids are 0..6 here
    // no address list at all -> full scan of every bucket
    val full = read(root, "bucketed", DDL, Map("cursorField" -> "user_id"))
    assert(scanPartitions(full) == 1 && full.count() == 40)
  }

  test("keyset, snapshot and bucketed modes are total on an empty source") {
    val none = events(10).where(lit(false))
    val kr = tmp("keyset_empty")
    assert(Paged.serveKeysetPages(none, "event_id", 60, 6, kr) == 0)
    assert(read(kr, "keyset", DDL + ", alias_idx BIGINT",
      Map("cursorField" -> "event_id")).count() == 0)
    val sr = tmp("snap_empty")
    assert(Paged.serveSnapshotPages(none.withColumnRenamed("event_id", "block"), "block", sr).isEmpty)
    assert(read(sr, "snapshot", "ts BIGINT").count() == 0)
    val br = tmp("bucket_empty")
    Paged.serveBucketedPages(none, "user_id", 4, br)
    assert(read(br, "bucketed", DDL, Map("cursorField" -> "user_id")).count() == 0)
    assert(read(br, "bucketed", DDL,
      Map("cursorField" -> "user_id", "addresses" -> "1,2,3")).count() == 0)
  }

  test("a malformed transport line is dropped, never thrown") {
    val root = tmp("corrupt")
    Paged.serveOffsetPages(events(100), Seq("event_id"), 50, root)
    // splice garbage into page 0 as an extra part file
    val dir = Paths.get(s"$root/pages/pg=0")
    Files.write(dir.resolve("part-zzz-corrupt.json"),
      "{\"event_id\": nope}\nnot json at all\n{}\n".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE)
    val df = read(root, "offset")
    // {} parses as an all-null payload row; the two malformed lines vanish
    assert(df.count() == 101)
    assert(df.where(col("event_id").isNull).count() == 1)
  }

  test("keyset resume: startCursor skips earlier batches, steps recount from zero") {
    val root = tmp("keyset") // chain from the earlier test: 250 rows, batches of 60
    // resume from the cursor a run killed after 2 batches would have
    // persisted: the 120th ordered id
    val df = read(root, "keyset", DDL + ", alias_idx BIGINT",
      Map("cursorField" -> "event_id", "startCursor" -> "120"))
    val rows = df.collect()
    assert(rows.length == 130)
    assert(rows.forall(_.getAs[Long]("event_id") > 120))
    rows.foreach { r =>
      assert(r.getAs[Long]("_step") == (r.getAs[Long]("event_id") - 121) / 60)
    }
  }

  test("offset mode streams: one checkpoint drains only newly published pages across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmp("stream")
    val base = "target/tmp/pagedspec_stream_io"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    def drain(): Unit = {
      val q = spark.readStream.format(Paged.FORMAT)
        .option("path", root).option("mode", "offset").option("schema", DDL)
        .load()
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Paged.serveOffsetPages(events(100).where(col("event_id") <= 60), Seq("event_id"), 20, root)
    drain()
    val firstIds = spark.read.schema(
      org.apache.spark.sql.types.StructType.fromDDL(DDL + ", _page BIGINT"))
      .parquet(s"$base/out").select("event_id").as[Long].collect().sorted
    assert(firstIds.toSeq == (1L to 60L))
    // the server publishes two more pages; the same checkpoint must drain
    // exactly those — no re-ingest of pages 0..2, no gaps
    Paged.appendOffsetPages(events(100).where(col("event_id") > 60), Seq("event_id"), 20, root)
    drain()
    val all = spark.read.schema(
      org.apache.spark.sql.types.StructType.fromDDL(DDL + ", _page BIGINT"))
      .parquet(s"$base/out").select("event_id", "_page").as[(Long, Long)].collect()
    assert(all.map(_._1).sorted.toSeq == (1L to 100L)) // exactly once, no dups/gaps
    assert(all.forall { case (id, pg) => pg == (id - 1) / 20 })
  }

  test("keyset mode streams: one checkpoint resumes MID-CHAIN exactly once across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmp("kstream")
    val base = "target/tmp/pagedspec_kstream_io"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val ddl = DDL + ", alias_idx BIGINT"
    val outSchema = org.apache.spark.sql.types.StructType.fromDDL(ddl + ", _step BIGINT")
    def drain(): Unit = {
      val q = spark.readStream.format(Paged.FORMAT)
        .option("path", root).option("mode", "keyset").option("cursorField", "event_id")
        .option("schema", ddl)
        .load()
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // cycle 1: 55 rows in batches of 20 -> 3 steps, the last one partial
    Paged.serveKeysetPages(events(100).where(col("event_id") <= 55), "event_id", 20, 2, root)
    drain()
    val firstRows = spark.read.schema(outSchema).parquet(s"$base/out")
      .select("event_id", "_step").as[(Long, Long)].collect()
    assert(firstRows.map(_._1).sorted.toSeq == (1L to 55L))
    assert(firstRows.map(_._2).max == 2L)
    // cycle 2: the server appends 45 more rows beyond the last cursor; the
    // same checkpoint must walk ONLY the appended batches, starting from
    // the checkpointed (steps=3, cursor=55) — a true mid-chain restart
    Paged.appendKeysetPages(events(100).where(col("event_id") > 55), "event_id", 20, 2, root)
    drain()
    val all = spark.read.schema(outSchema).parquet(s"$base/out")
      .select("event_id", "_step", "alias_idx").as[(Long, Long, Long)].collect()
    assert(all.map(_._1).sorted.toSeq == (1L to 100L)) // exactly once, no dups/gaps
    // global step numbering continues across the restart: cycle-2 rows rank
    // from the appended run's local batching, offset by cycle 1's 3 steps
    all.foreach { case (id, step, _) =>
      val expected = if (id <= 55) (id - 1) / 20 else 3 + (id - 56) / 20
      assert(step == expected, s"id $id step $step != $expected")
    }
    // a third drain with nothing published ingests nothing
    drain()
    assert(spark.read.schema(outSchema).parquet(s"$base/out").count() == 100)
  }

  test("appendKeysetPages rejects ids at or below the chain's last cursor") {
    val root = tmp("kappendguard")
    Paged.serveKeysetPages(events(40), "event_id", 10, 2, root)
    val e = intercept[IllegalArgumentException] {
      Paged.appendKeysetPages(events(50).where(col("event_id") > 35), "event_id", 10, 2, root)
    }
    assert(e.getMessage.contains("last cursor"))
  }

  test("serveKeysetPages fails loudly on duplicate ids straddling a batch boundary") {
    // ids 1..9 then twelve 10s: batch 1 ends at 10 and batch 2 is ALL 10s,
    // so steps 2 and 3 would both be addressed by cursor 10 — the dir
    // collision the guard must catch
    val twelveTens = spark.range(12).selectExpr("CAST(10 AS BIGINT) AS event_id",
      "CAST(1010 AS BIGINT) AS ts", "CAST(3 AS BIGINT) AS user_id",
      "'t0' AS event_type", "15.0D AS value")
    val e = intercept[IllegalArgumentException] {
      Paged.serveKeysetPages(events(9).union(twelveTens), "event_id", 10, 2, tmp("kdup"))
    }
    assert(e.getMessage.contains("duplicate"))
    // duplicates INSIDE a batch don't collide cursor labels and are allowed
    Paged.serveKeysetPages(events(40).union(events(40).where(col("event_id") === 9)),
      "event_id", 10, 2, tmp("kdupok"))
  }

  test("non-BIGINT cursorField fails at planning time with a clear message") {
    val root = tmp("ktype")
    Paged.serveKeysetPages(events(10), "event_id", 5, 1, root)
    val e = intercept[IllegalArgumentException] {
      read(root, "keyset",
        ddl = "event_id INT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE",
        more = Map("cursorField" -> "event_id")).collect()
    }
    assert(e.getMessage.contains("BIGINT"))
  }

  test("bucketed mode caps the address list at maxAddresses, fails at planning time") {
    val root = tmp("kcap")
    Paged.serveBucketedPages(events(50), "user_id", 4, root)
    val e = intercept[IllegalArgumentException] {
      read(root, "bucketed", more = Map("cursorField" -> "user_id",
        "addresses" -> (1L to 20L).mkString(","), "maxAddresses" -> "10")).collect()
    }
    assert(e.getMessage.contains("cap"))
  }

  test("manifest is the commit marker: reading a root without one fails loudly") {
    val root = tmp("nomanifest")
    Paged.serveOffsetPages(events(10), Seq("event_id"), 5, root)
    Files.delete(Paths.get(s"$root/${Paged.MANIFEST}"))
    val e = intercept[Exception] { read(root, "offset").collect() }
    assert(e.getMessage != null)
  }
}
