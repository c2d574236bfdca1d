package graft

import graft.operators.BucketedSnapshots
import org.apache.spark.sql.functions._

/** Merge-on-read delete vectors: key-delete sidecars committed through
  * the normal manifest flip, folded at every read path, absorbed by
  * rewrites, folded by compaction past the budget — with the
  * write-amplification drop MEASURED, not asserted by vibes.
  */
class DeleteVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val path = s"target/tmp/dvspec_$name"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    path
  }

  private def fs(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select("k", "v").as[(Long, Double)].collect().toMap

  private def dirBytes(path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(path)
    if (!f.exists(p)) 0L
    else f.getContentSummary(p).getLength
  }

  test("delete == copy-on-write result on every read path; pinned pre-delete version intact; feed emits D") {
    val path = fresh("equiv")
    val all = (1L to 400L).map(i => (i, i * 1.0)).toDF("k", "v")
    val v1 = BucketedSnapshots.upsertByKey(spark, all, path, "k", 8,
      keepVersions = 4, statsColumns = Seq("v"))
    val dead = Seq(3L, 77L, 150L, 399L)
    val v2 = BucketedSnapshots.deleteKeys(spark, path, dead.toDF("k"), "k",
      keepVersions = 4)
    assert(v2 > v1)
    val want = (1L to 400L).filterNot(dead.contains).map(i => i -> i * 1.0).toMap
    // live read
    assert(rows(BucketedSnapshots.readCurrent(spark, path)) == want)
    // snapshot isolation: the pre-delete version still has the keys
    assert(rows(BucketedSnapshots.readSnapshot(spark, path, v1)).keySet.contains(77L))
    // point lookup folds (deleted key absent, live neighbor present)
    assert(BucketedSnapshots.readSnapshotKeys(spark, path, v2, "k",
      Seq(77L, 78L)).select("k").as[Long].collect().toSet == Set(78L))
    // stats-pruned range read folds (77 and 150 in range, deleted)
    val pruned = BucketedSnapshots.readSnapshotWhere(spark, path, v2, "v",
      Some(BigDecimal(70)), Some(BigDecimal(160)))
      .select("k").as[Long].collect().toSet
    assert(pruned == (70L to 160L).toSet -- Set(77L, 150L))
    // the change feed between the versions emits real D rows with preimages
    val feed = BucketedSnapshots.readChangesBetween(spark, path, "k", v1, v2)
      .select("op", "k").as[(String, Long)].collect().toSet
    assert(feed == dead.map(k => ("D", k)).toSet,
      s"feed must be exactly the four deletes, got $feed")
  }

  test("write amplification: a 2-key delete writes ~key bytes, not bucket bytes") {
    val path = fresh("amp")
    // big bucket payloads so the ratio is unambiguous
    val all = (1L to 5000L).map(i => (i, i * 1.0, s"payload_$i" * 20)).toDF("k", "v", "pad")
    BucketedSnapshots.upsertByKey(spark, all, path, "k", 4, keepVersions = 2)
    val dataBytes = dirBytes(s"$path/b=0") + dirBytes(s"$path/b=1") +
      dirBytes(s"$path/b=2") + dirBytes(s"$path/b=3")
    val before = dirBytes(path)
    BucketedSnapshots.deleteKeys(spark, path, Seq(17L, 4242L).toDF("k"), "k",
      keepVersions = 2)
    val written = dirBytes(path) - before
    assert(written > 0, "the delete commit must write its sidecars")
    assert(written * 20 < dataBytes,
      s"a 2-key merge-on-read delete wrote $written bytes vs $dataBytes of bucket data " +
        "— expected <5% (copy-on-write would rewrite whole buckets)")
    assert(rows(BucketedSnapshots.readCurrent(spark, path)
      .select("k", "v")).size == 4998)
  }

  test("sidecar budget: past maxDvsPerBucket the bucket folds copy-on-write, entry comes out sidecar-free") {
    val path = fresh("budget")
    // nBuckets=1 so every delete hits the same bucket
    val all = (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v")
    BucketedSnapshots.upsertByKey(spark, all, path, "k", 1, keepVersions = 2)
    (1L to 3L).foreach { i =>
      BucketedSnapshots.deleteKeys(spark, path, Seq(i).toDF("k"), "k",
        keepVersions = 2, maxDvsPerBucket = 3)
    }
    assert(BucketedSnapshots.deleteVectorCounts(spark, path) == Map(0 -> 3))
    // the 4th delete exceeds the budget: fold — no sidecars left
    BucketedSnapshots.deleteKeys(spark, path, Seq(4L).toDF("k"), "k",
      keepVersions = 2, maxDvsPerBucket = 3)
    assert(BucketedSnapshots.deleteVectorCounts(spark, path) == Map.empty,
      "the fold must absorb every sidecar AND this commit's keys")
    assert(rows(BucketedSnapshots.readCurrent(spark, path)) ==
      (5L to 100L).map(i => i -> i * 1.0).toMap)
  }

  test("compaction folds sidecars; rewriting upserts absorb them; re-upserted keys come back exactly once") {
    val path = fresh("fold")
    val all = (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v")
    BucketedSnapshots.upsertByKey(spark, all, path, "k", 2, keepVersions = 2)
    BucketedSnapshots.deleteKeys(spark, path, Seq(10L, 11L, 12L).toDF("k"), "k",
      keepVersions = 2)
    assert(BucketedSnapshots.deleteVectorCounts(spark, path).nonEmpty)
    // compact folds every sidecar-carrying bucket
    val before = rows(BucketedSnapshots.readCurrent(spark, path))
    BucketedSnapshots.compact(spark, path, maxFilesPerBucket = 8, keepVersions = 2)
    assert(BucketedSnapshots.deleteVectorCounts(spark, path) == Map.empty)
    assert(rows(BucketedSnapshots.readCurrent(spark, path)) == before,
      "compaction must not change the read")
    // delete again, then RE-UPSERT one of the deleted keys: the rewrite
    // absorbs the bucket's sidecar, the key comes back exactly once
    BucketedSnapshots.deleteKeys(spark, path, Seq(20L, 21L).toDF("k"), "k",
      keepVersions = 2)
    BucketedSnapshots.upsertByKey(spark, Seq((20L, 99.0)).toDF("k", "v"),
      path, "k", 2, keepVersions = 2)
    val after = BucketedSnapshots.readCurrent(spark, path)
      .filter(col("k").isin(20L, 21L)).select("k", "v").as[(Long, Double)].collect()
    assert(after.toSeq == Seq((20L, 99.0)),
      s"20 re-upserted once, 21 stays deleted; got ${after.toSeq}")
    // 21's bucket may or may not share 20's — whatever survived, the dv
    // accounting stays consistent with the read
    assert(!rows(BucketedSnapshots.readCurrent(spark, path)).contains(21L))
  }

  test("retention GC cleans unreferenced sidecars, keeps referenced ones; tagged versions pin theirs") {
    val path = fresh("gc")
    val all = (1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v")
    BucketedSnapshots.upsertByKey(spark, all, path, "k", 1, keepVersions = 2)
    val vDel = BucketedSnapshots.deleteKeys(spark, path, Seq(5L).toDF("k"), "k",
      keepVersions = 2)
    BucketedSnapshots.tag(spark, path, "erasure_audit", vDel)
    def dvDirs(): Seq[String] = {
      val base = new org.apache.hadoop.fs.Path(s"$path/b=0")
      fs(path).listStatus(base).toSeq.map(_.getPath.getName).filter(_.startsWith("dv="))
    }
    assert(dvDirs().nonEmpty)
    // fold (clears the live reference), then push the delete version out
    // of retention — the TAG must keep the sidecar readable
    BucketedSnapshots.compact(spark, path, maxFilesPerBucket = 8, keepVersions = 2)
    BucketedSnapshots.upsertByKey(spark, Seq((60L, 60.0)).toDF("k", "v"),
      path, "k", 1, keepVersions = 2)
    BucketedSnapshots.upsertByKey(spark, Seq((61L, 61.0)).toDF("k", "v"),
      path, "k", 1, keepVersions = 2)
    assert(!BucketedSnapshots.versions(spark, path)
      .filter(v => v != vDel).isEmpty)
    assert(dvDirs().nonEmpty, "the tagged version still references its sidecar")
    assert(!rows(BucketedSnapshots.readTag(spark, path, "erasure_audit")).contains(5L),
      "the tagged read folds its sidecar")
    // drop the tag: the sidecar is unreferenced but deliberately NOT
    // collected yet (GC only collects at-or-below the highest referenced
    // id, protecting a racer's just-staged sidecar); the NEXT delete
    // commit raises the ceiling past it and the old one ages out
    BucketedSnapshots.dropTag(spark, path, "erasure_audit")
    BucketedSnapshots.deleteKeys(spark, path, Seq(6L).toDF("k"), "k",
      keepVersions = 2)
    assert(dvDirs() == Seq("dv=2"),
      s"the pre-fold sidecar must age out once the ceiling passes it, got ${dvDirs()}")
  }
}
