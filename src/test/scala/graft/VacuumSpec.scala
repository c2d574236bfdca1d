package graft

import graft.operators.BucketedSnapshots
import org.apache.spark.sql.functions._

/** [[BucketedSnapshots.vacuum]]: crash-orphan and discarded-branch
  * cleanup, pin safety (retained window + tags + branch heads untouched),
  * the age horizon as the concurrency guard, and read equivalence before
  * and after the sweep.
  */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new org.apache.hadoop.fs.Path("target")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val path = s"target/tmp/vacspec_$name"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    path
  }

  private def mkdir(p: String): Unit =
    fs.mkdirs(new org.apache.hadoop.fs.Path(p))

  private def exists(p: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(p))

  test("crash orphans above the referenced ceiling are swept; live dirs and reads are untouched") {
    val path = fresh("orphans")
    BucketedSnapshots.upsertByKey(spark,
      (1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v"), path, "k", 8,
      keepVersions = 2)
    val before = BucketedSnapshots.readCurrent(spark, path)
      .as[(Long, Double)].collect().toSet
    // simulate a crashed commit: claimed-but-never-referenced data and dv
    // dirs (ids ABOVE everything referenced — retention gc never reaches
    // them), plus a dead writer's staging sibling and a torn tmp manifest
    Seq((77L, 0.0)).toDF("k", "v").write.parquet(s"$path/b=3/v=99")
    Seq(77L).toDF("k").write.parquet(s"$path/b=5/dv=99")
    mkdir(path + "__vstaging_deadbeef0000/b=1")
    fs.create(new org.apache.hadoop.fs.Path(s"$path/manifest/v=88.txt.tmp"), true).close()
    val n = BucketedSnapshots.vacuum(spark, path, olderThanMs = 0L)
    assert(n >= 4, s"expected at least 4 sweeps, got $n")
    assert(!exists(s"$path/b=3/v=99") && !exists(s"$path/b=5/dv=99"))
    assert(!exists(path + "__vstaging_deadbeef0000"))
    assert(!exists(s"$path/manifest/v=88.txt.tmp"))
    val after = BucketedSnapshots.readCurrent(spark, path)
      .as[(Long, Double)].collect().toSet
    assert(after == before, "vacuum must not change the readable table")
  }

  test("a discarded branch's staged manifests and dirs are swept; main unaffected") {
    val path = fresh("branch")
    BucketedSnapshots.upsertByKey(spark,
      (1L to 100L).map(i => (i, i)).toDF("k", "n"), path, "k", 8, keepVersions = 2)
    BucketedSnapshots.branch(spark, path, "etl")
    val bv = BucketedSnapshots.commitToBranch(spark, path, "etl",
      Seq((1L, 999L), (1000L, 1L)).toDF("k", "n"), "k", nBuckets = 8)
    assert(exists(s"$path/manifest/v=$bv.txt"))
    val stagedDirs = BucketedSnapshots.readManifest(spark, path, bv).toSeq
      .map { case (b, v) => s"$path/b=$b/v=$v" }
    BucketedSnapshots.dropBranch(spark, path, "etl")
    BucketedSnapshots.vacuum(spark, path, olderThanMs = 0L)
    assert(!exists(s"$path/manifest/v=$bv.txt"), "discarded branch manifest must go")
    // the branch's own NEW dirs go; dirs it shared with main must stay
    val mainDirs = BucketedSnapshots.readManifest(spark, path,
      BucketedSnapshots.currentVersion(spark, path).get).toSeq
      .map { case (b, v) => s"$path/b=$b/v=$v" }.toSet
    stagedDirs.filterNot(mainDirs).foreach(d =>
      assert(!exists(d), s"discarded branch dir $d must be vacuumed"))
    mainDirs.foreach(d => assert(exists(d), s"main dir $d must survive"))
    assert(BucketedSnapshots.readCurrent(spark, path).count() == 100)
  }

  test("tagged and branch-pinned versions survive vacuum, however old") {
    val path = fresh("pins")
    val v1 = BucketedSnapshots.upsertByKey(spark,
      (1L to 50L).map(i => (i, i)).toDF("k", "n"), path, "k", 4, keepVersions = 2)
    BucketedSnapshots.tag(spark, path, "model-x", v1)
    BucketedSnapshots.upsertByKey(spark,
      Seq((1L, 100L)).toDF("k", "n"), path, "k", 4, keepVersions = 2)
    BucketedSnapshots.upsertByKey(spark,
      Seq((2L, 200L)).toDF("k", "n"), path, "k", 4, keepVersions = 2)
    BucketedSnapshots.branch(spark, path, "wip")
    BucketedSnapshots.commitToBranch(spark, path, "wip",
      Seq((3L, 300L)).toDF("k", "n"), "k", nBuckets = 4)
    BucketedSnapshots.vacuum(spark, path, olderThanMs = 0L)
    // the tag pin: v1 (outside the keepVersions=2 window) still reads
    val tagged = BucketedSnapshots.readTag(spark, path, "model-x")
      .as[(Long, Long)].collect().toMap
    assert(tagged.size == 50 && tagged(1L) == 1L)
    // the branch pin: head still reads
    val br = BucketedSnapshots.readBranch(spark, path, "wip")
      .as[(Long, Long)].collect().toMap
    assert(br(3L) == 300L && br(1L) == 100L)
  }

  test("the age horizon protects young orphans (in-flight commit guard)") {
    val path = fresh("horizon")
    BucketedSnapshots.upsertByKey(spark,
      Seq((1L, 1.0)).toDF("k", "v"), path, "k", 4, keepVersions = 2)
    Seq((9L, 9.0)).toDF("k", "v").write.parquet(s"$path/b=0/v=50")
    val n = BucketedSnapshots.vacuum(spark, path) // default 1 h horizon
    assert(n == 0, s"a seconds-old orphan must survive the default horizon, swept $n")
    assert(exists(s"$path/b=0/v=50"))
    assert(BucketedSnapshots.vacuum(spark, path, olderThanMs = 0L) >= 1)
    assert(!exists(s"$path/b=0/v=50"))
  }

  test("outstanding delete-vector sidecars survive; only unreferenced dv ids sweep") {
    val path = fresh("dv")
    val base = (1L to 100L).map(i => (i, i)).toDF("k", "n")
    BucketedSnapshots.upsertByKey(spark, base, path, "k", 8, keepVersions = 2)
    BucketedSnapshots.deleteKeys(spark, path,
      Seq(1L, 2L, 3L).toDF("k"), "k", keepVersions = 2)
    val liveDvs = BucketedSnapshots.deleteVectorCounts(spark, path)
    assert(liveDvs.values.sum > 0, "precondition: sidecars outstanding")
    Seq(4L).toDF("k").write.parquet(s"$path/b=2/dv=77") // orphan
    BucketedSnapshots.vacuum(spark, path, olderThanMs = 0L)
    assert(!exists(s"$path/b=2/dv=77"))
    val got = BucketedSnapshots.readCurrent(spark, path)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 97 && !got.contains(1L),
      "live sidecars must keep folding after vacuum")
  }
}
