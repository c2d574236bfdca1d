package graft

import graft.operators.{BucketedSnapshots, TableMeta}
import org.apache.spark.sql.functions._

/** Metadata tables (`history`/`files`/`statsTable`): versions, liveness,
  * sidecar counts, refs (tags AND branch heads), per-file sizes, and the
  * verbatim stat bounds — all answerable without opening a data file.
  */
class MetadataTablesSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val path = s"target/tmp/metaspec_$name"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    path
  }

  test("history: liveness, dv counts, arity, tag and branch refs per readable version") {
    val path = fresh("hist")
    val v1 = BucketedSnapshots.upsertByKey(spark,
      (1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v"), path, "k", 4, keepVersions = 5)
    BucketedSnapshots.tag(spark, path, "trainpin", v1)
    val v2 = BucketedSnapshots.deleteKeys(spark, path,
      (1L to 50L).toDF("k"), "k", keepVersions = 5)
    BucketedSnapshots.branch(spark, path, "wip")
    val v3 = BucketedSnapshots.commitToBranch(spark, path, "wip",
      Seq((300L, 3.0)).toDF("k", "v"), "k", 4)
    val h = TableMeta.history(spark, path)
      .select("version", "is_live", "buckets", "delete_vectors", "n_buckets", "refs")
      .as[(Long, Boolean, Long, Long, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(h(v1)._6 == "trainpin" && !h(v1)._2 && h(v1)._4 == 0L)
    assert(h(v2)._2 && h(v2)._4 == 4L, "v2 carries one sidecar per bucket")
    assert(h(v3)._6 == "branch:wip" && !h(v3)._2,
      "the branch head is readable but not live")
    assert(h.values.forall(_._5 == 4), "arity visible on every version")
    assert(h.values.forall(_._3 == 4L), "bucket count visible")
  }

  test("files: per-file rows with real sizes; compaction measurably shrinks the count") {
    val path = fresh("files")
    BucketedSnapshots.upsertByKey(spark,
      (1L to 500L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(8),
      path, "k", 2, keepVersions = 3)
    val before = TableMeta.files(spark, path)
    assert(before.count() > 2, "fragmented fixture must show >1 file per bucket")
    assert(before.agg(min(col("bytes"))).as[Long].head() > 0, "real file sizes")
    val v2 = BucketedSnapshots.compact(spark, path, maxFilesPerBucket = 1, keepVersions = 3)
    val after = TableMeta.files(spark, path, Some(v2))
    assert(after.count() == 2 &&
      after.select("bucket").distinct().count() == 2)
    // the pre-compaction version's listing is still exact (time travel)
    assert(TableMeta.files(spark, path,
      Some(BucketedSnapshots.versions(spark, path).min)).count() == before.count())
    // unknown version fails loudly
    intercept[IllegalArgumentException] { TableMeta.files(spark, path, Some(99L)) }
  }

  test("statsTable: the sidecar bounds verbatim — what pruning actually compares") {
    val path = fresh("stats")
    BucketedSnapshots.upsertByKey(spark,
      (1L to 100L).map(i => (i, i * 10L)).toDF("k", "val"), path, "k", 2,
      keepVersions = 3, statsColumns = Seq("val"))
    val st = TableMeta.statsTable(spark, path)
      .filter(col("file") === "") // whole-bucket entries (per-file rows are hints)
      .select("bucket", "column", "typ", "min", "max")
      .as[(Int, String, String, String, String)].collect()
    assert(st.length == 2 && st.forall(s => s._2 == "val" && s._3 == "l"))
    val lo = st.map(_._4.toLong).min; val hi = st.map(_._5.toLong).max
    assert(lo == 10L && hi == 1000L, s"global bounds must be exact, got [$lo,$hi]")
    // per-bucket bounds must cover exactly that bucket's rows
    val byBucket = BucketedSnapshots.readCurrent(spark, path)
      .groupBy(pmod(xxhash64(col("k")), lit(2L)).cast("int").as("b"))
      .agg(min("val").as("lo"), max("val").as("hi"))
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    st.foreach { s =>
      assert((s._4.toLong, s._5.toLong) == byBucket(s._1),
        s"bucket ${s._1} sidecar bounds must equal the data bounds")
    }
  }
}
