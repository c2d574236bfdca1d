package graft

import graft.operators.{BucketedSnapshots, Snapshots}
import org.apache.spark.sql.functions._

/** Named refs (tags) on versioned tables — the training-run
  * reproducibility pin: a tagged version survives any number of commits
  * past the retention window, byte-stable, on both layouts; dropping the
  * tag releases it to normal retention; names are validated; accidental
  * re-pinning requires an explicit overwrite.
  */
class TagsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val path = s"target/tmp/tagspec_$name"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    path
  }

  private def fs(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("plain snapshots: a tagged version survives retention, byte-stable; dropTag releases it") {
    val path = fresh("plain")
    val v1 = Snapshots.commitWith(spark, path,
      _ => Seq((1L, "a"), (2L, "b")).toDF("k", "s"), keepVersions = 2)
    Snapshots.tag(spark, path, "train-run-1", v1)
    // push v1 far outside the keepVersions=2 window
    (1 to 4).foreach { i =>
      Snapshots.commitWith(spark, path,
        _ => Seq((1L, s"x$i")).toDF("k", "s"), keepVersions = 2)
    }
    assert(!Snapshots.pointerStateRaw(spark, path).get._2.contains(v1),
      "v1 must be OUTSIDE the pointer's retained window")
    assert(Snapshots.versions(spark, path).contains(v1), "but still readable via the tag")
    val pinned = Snapshots.readTag(spark, path, "train-run-1")
      .as[(Long, String)].collect().toSet
    assert(pinned == Set((1L, "a"), (2L, "b")), "the tagged read is the pinned content")
    assert(Snapshots.listTags(spark, path) == Map("train-run-1" -> v1))
    // untagged expired versions are GONE (v2 fell out and was GC'd)
    assert(!fs(path).exists(new org.apache.hadoop.fs.Path(s"$path/v=${v1 + 1}")),
      "untagged expired versions must still be GC'd around the pin")
    // release: the next commit GCs the tagged version
    Snapshots.dropTag(spark, path, "train-run-1")
    Snapshots.commitWith(spark, path, _ => Seq((9L, "z")).toDF("k", "s"), keepVersions = 2)
    assert(!fs(path).exists(new org.apache.hadoop.fs.Path(s"$path/v=$v1")),
      "a dropped tag releases the version to normal retention")
    intercept[java.io.FileNotFoundException] {
      Snapshots.readTag(spark, path, "train-run-1")
    }
  }

  test("bucketed snapshots: the tag pins the manifest AND every bucket dir it references") {
    val path = fresh("bucketed")
    val all = (1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v")
    val v1 = BucketedSnapshots.upsertByKey(spark, all, path, "k", nBuckets = 8)
    BucketedSnapshots.tag(spark, path, "run.2026-08-16", v1)
    val m1 = BucketedSnapshots.readManifest(spark, path, v1)
    // many later commits rewrite EVERY bucket, with keepVersions=2
    (1 to 4).foreach { i =>
      BucketedSnapshots.upsertByKey(
        spark, (1L to 200L).map(k => (k, k * 1.0 + i)).toDF("k", "v"),
        path, "k", nBuckets = 8, keepVersions = 2)
    }
    val pinned = BucketedSnapshots.readTag(spark, path, "run.2026-08-16")
      .as[(Long, Double)].collect().toMap
    assert(pinned == (1L to 200L).map(i => i -> i * 1.0).toMap,
      "the tagged table version must read byte-stable after 4 full rewrites")
    // every bucket dir the tagged manifest references is still on disk
    m1.foreach { case (b, bv) =>
      assert(fs(path).exists(new org.apache.hadoop.fs.Path(s"$path/b=$b/v=$bv")),
        s"tagged bucket dir b=$b/v=$bv must survive GC")
    }
    // the live table is unaffected
    val live = BucketedSnapshots.readCurrent(spark, path)
      .as[(Long, Double)].collect().toMap
    assert(live == (1L to 200L).map(i => i -> (i * 1.0 + 4)).toMap)
    // release and GC on the next commit
    BucketedSnapshots.dropTag(spark, path, "run.2026-08-16")
    BucketedSnapshots.upsertByKey(
      spark, Seq((1L, 0.0)).toDF("k", "v"), path, "k", nBuckets = 8, keepVersions = 2)
    assert(!fs(path).exists(new org.apache.hadoop.fs.Path(manifestOf(path, v1))),
      "a dropped tag's manifest is GC'd once outside retention")
  }

  private def manifestOf(path: String, v: Long) = s"$path/manifest/v=$v.txt"

  test("stats-pruned and point-lookup reads work at a tagged version outside retention") {
    val path = fresh("tagreads")
    val rows = (1L to 100L).map(i => (i, i * 10L)).toDF("k", "v")
    val v1 = BucketedSnapshots.upsertByKey(
      spark, rows, path, "k", nBuckets = 4, statsColumns = Seq("v"))
    BucketedSnapshots.tag(spark, path, "pin", v1)
    (1 to 3).foreach { i =>
      BucketedSnapshots.upsertByKey(
        spark, (1L to 100L).map(k => (k, k * 10L + i)).toDF("k", "v"),
        path, "k", nBuckets = 4, keepVersions = 2)
    }
    assert(!Snapshots.pointerStateRaw(spark, path).get._2.contains(v1))
    // the tagged version's stats sidecar survived with it: pruned reads
    // resolve and filter against the PINNED content
    val got = BucketedSnapshots.readSnapshotWhere(
      spark, path, v1, "v", Some(BigDecimal(100)), Some(BigDecimal(200)))
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(got == (10L to 20L).map(k => (k, k * 10L)).toSet)
    val lk = BucketedSnapshots.readSnapshotKeys(spark, path, v1, "k", Seq(7L: Any))
      .select("v").as[Long].collect().toSet
    assert(lk == Set(70L), "point lookup at the pinned version sees pre-expiry values")
    // the live version reads its own (updated) values
    assert(BucketedSnapshots.readCurrentKeys(spark, path, "k", Seq(7L: Any))
      .select("v").as[Long].head() == 73L)
  }

  test("tag hygiene: unknown versions, duplicate names, bad names all fail fast") {
    val path = fresh("hygiene")
    val v1 = Snapshots.commitWith(spark, path, _ => Seq((1L, 1)).toDF("k", "n"))
    intercept[IllegalArgumentException] { Snapshots.tag(spark, path, "t", v1 + 99) }
    Snapshots.tag(spark, path, "t", v1)
    intercept[IllegalArgumentException] { Snapshots.tag(spark, path, "t", v1) }
    Snapshots.tag(spark, path, "t", v1, overwrite = true) // explicit re-pin OK
    intercept[IllegalArgumentException] { Snapshots.tag(spark, path, "bad name", v1) }
    intercept[IllegalArgumentException] { Snapshots.tag(spark, path, "../escape", v1) }
    intercept[IllegalArgumentException] { Snapshots.tag(spark, path, "", v1) }
  }
}
