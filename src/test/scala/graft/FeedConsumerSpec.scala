package graft

import graft.operators.{BucketedSnapshots, FeedConsumer}
import org.apache.spark.sql.functions._

/** The incremental change-feed consumer: bootstrap + incremental
  * maintenance equals the from-scratch rollup across inserts, updates,
  * group moves, and deletes; a crash between the downstream commit and
  * the offset write redoes idempotently (pinned-base recompute); caught-up
  * and data-less (compaction) upstream commits advance without churn.
  */
class FeedConsumerSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val path = s"target/tmp/feedspec_$name"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    path
  }

  private def fs(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ch(rows: (Long, Long, String, String, Long)*) =
    rows.toDF("k", "seq", "op", "g", "v")

  private def rollup(consumer: String): Set[(String, Long, Long)] =
    FeedConsumer.readRollup(spark, consumer)
      .select("g", "n", "sum_v").as[(String, Long, Long)].collect().toSet

  private def scratch(up: String): Set[(String, Long, Long)] =
    BucketedSnapshots.readTable(spark, up)
      .groupBy("g").agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .as[(String, Long, Long)].collect().toSet

  test("bootstrap + incremental drains equal the from-scratch rollup through moves and deletes") {
    val up = fresh("inc_up"); val cons = fresh("inc_cons")
    // commit 1: bootstrap state
    BucketedSnapshots.applyChanges(spark,
      ch((1L, 1L, "I", "a", 10L), (2L, 1L, "I", "a", 20L), (3L, 1L, "I", "b", 30L)),
      up, "k", nBuckets = 4)
    val d1 = FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 4)
    assert(d1.isDefined)
    assert(rollup(cons) == Set(("a", 2L, 30L), ("b", 1L, 30L)))
    // commit 2: update in place, GROUP MOVE (2: a->b), delete (3), insert (4)
    BucketedSnapshots.applyChanges(spark,
      ch((1L, 2L, "U", "a", 15L), (2L, 2L, "U", "b", 20L),
        (3L, 2L, "D", "b", 30L), (4L, 2L, "I", "c", 40L)),
      up, "k", nBuckets = 4)
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 4)
    assert(rollup(cons) == scratch(up))
    assert(rollup(cons) == Set(("a", 1L, 15L), ("b", 1L, 20L), ("c", 1L, 40L)))
    // commit 3: empty a group entirely — its rollup row must DELETE
    BucketedSnapshots.applyChanges(spark,
      ch((1L, 3L, "D", "a", 15L)), up, "k", nBuckets = 4)
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 4)
    assert(rollup(cons) == scratch(up))
    assert(!rollup(cons).exists(_._1 == "a"), "an emptied group must disappear")
  }

  test("crash between downstream commit and offset write: the redo is idempotent") {
    val up = fresh("redo_up"); val cons = fresh("redo_cons")
    BucketedSnapshots.applyChanges(spark,
      ch((1L, 1L, "I", "a", 10L), (2L, 1L, "I", "b", 20L)), up, "k", nBuckets = 4)
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 4)
    val offsetBefore = {
      val in = fs(cons).open(new org.apache.hadoop.fs.Path(s"$cons/_OFFSET"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    BucketedSnapshots.applyChanges(spark,
      ch((1L, 2L, "U", "a", 99L), (3L, 2L, "I", "b", 5L)), up, "k", nBuckets = 4)
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 4)
    val want = rollup(cons)
    // simulate the crash: the downstream commit landed but the offset
    // write did not — restore the PREVIOUS offset and drain again
    val out = fs(cons).create(new org.apache.hadoop.fs.Path(s"$cons/_OFFSET"), true)
    out.write(offsetBefore.getBytes("UTF-8")); out.close()
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 4)
    assert(rollup(cons) == want, "the redo must converge to the same rollup, not double-apply")
    assert(rollup(cons) == scratch(up))
    assert(FeedConsumer.offset(spark, cons).exists(_._1 ==
      BucketedSnapshots.currentVersion(spark, up).get))
  }

  test("the feed crosses an upstream REBUCKET: data-less arity change is a no-op, later drains exact") {
    val up = fresh("rebk_up"); val cons = fresh("rebk_cons")
    BucketedSnapshots.applyChanges(spark,
      ch((1L, 1L, "I", "a", 10L), (2L, 1L, "I", "b", 20L), (3L, 1L, "I", "b", 30L)),
      up, "k", nBuckets = 2)
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 2)
    val before = rollup(cons)
    // arity evolution upstream: every bucket id changes meaning, every
    // manifest entry differs — but the KEYED diff finds no row change,
    // so the consumer must advance its offset without downstream churn
    val vR = BucketedSnapshots.rebucket(spark, up, "k", newNBuckets = 8)
    val d = FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 2)
    assert(FeedConsumer.offset(spark, cons).exists(_._1 == vR),
      "the rebucket commit must advance the consumer offset")
    assert(rollup(cons) == before, "a data-less arity change must not move the rollup")
    // a subsequent REAL change under the new arity drains exactly
    BucketedSnapshots.applyChanges(spark,
      ch((2L, 2L, "U", "a", 25L), (4L, 2L, "I", "c", 40L)), up, "k", nBuckets = 8)
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 2)
    assert(rollup(cons) == scratch(up))
    assert(rollup(cons) == Set(("a", 2L, 35L), ("b", 1L, 30L), ("c", 1L, 40L)))
    assert(d.isDefined)
  }

  test("caught-up and data-less (compaction) upstream commits advance without rollup churn") {
    val up = fresh("noop_up"); val cons = fresh("noop_cons")
    BucketedSnapshots.applyChanges(spark,
      ch((1L, 1L, "I", "a", 10L)), up, "k", nBuckets = 2)
    val d1 = FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 2)
    // caught up: same downstream version back, no new commit
    val d2 = FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 2)
    assert(d2 == d1)
    // fragment upstream buckets (8 staging partitions), drain the data
    // change, then compact: a commit with NO data change
    BucketedSnapshots.applyChanges(spark,
      ch((10L to 40L).map(i => (i, 2L, "I", "a", 1L)): _*).repartition(8),
      up, "k", nBuckets = 2)
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 2)
    val afterData = FeedConsumer.offset(spark, cons).get
    val vCompact = BucketedSnapshots.compact(spark, up)
    val d3 = FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 2)
    assert(FeedConsumer.offset(spark, cons).exists(_._1 == vCompact),
      "a compaction-only commit must advance the offset")
    assert(d3.contains(afterData._2),
      "a data-less commit must not create a new downstream version")
    assert(rollup(cons) == scratch(up))
  }

  test("long outage past maxCatchupVersions re-bootstraps: bounded read, identical rollup") {
    val up = fresh("gap_up"); val cons = fresh("gap_cons")
    BucketedSnapshots.applyChanges(spark,
      ch((1L, 1L, "I", "a", 10L), (2L, 1L, "I", "b", 20L), (3L, 1L, "I", "c", 30L)),
      up, "k", nBuckets = 4, keepVersions = 2)
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"), nBuckets = 4)
    // FIVE upstream commits while the consumer is down — updates, a group
    // move, a delete that empties group c, and inserts. keepVersions=2 on
    // the upstream GCs the intermediate versions AND the consumer's
    // offset version: the coalesced feed read over (1, 6] is not just
    // expensive, it is IMPOSSIBLE — only the fallback can catch up.
    BucketedSnapshots.applyChanges(spark, ch((1L, 2L, "U", "a", 11L)),
      up, "k", nBuckets = 4, keepVersions = 2)
    BucketedSnapshots.applyChanges(spark, ch((4L, 3L, "I", "a", 40L)),
      up, "k", nBuckets = 4, keepVersions = 2)
    BucketedSnapshots.applyChanges(spark, ch((2L, 4L, "U", "a", 20L)), // b -> a
      up, "k", nBuckets = 4, keepVersions = 2)
    BucketedSnapshots.applyChanges(spark, ch((3L, 5L, "D", "c", 30L)), // empties c
      up, "k", nBuckets = 4, keepVersions = 2)
    BucketedSnapshots.applyChanges(spark, ch((5L, 6L, "I", "b", 50L)),
      up, "k", nBuckets = 4, keepVersions = 2)
    assert(!BucketedSnapshots.versions(spark, up).contains(1L),
      "precondition: the consumer's offset version must be GC'd upstream")
    val d = FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"),
      nBuckets = 4, maxCatchupVersions = 2)
    assert(d.isDefined)
    assert(FeedConsumer.offset(spark, cons).exists(_._1 == 6L))
    assert(rollup(cons) == scratch(up))
    assert(!rollup(cons).exists(_._1 == "c"),
      "a group emptied during the outage must be tombstoned by the re-bootstrap")
    // idempotent redo of the fallback itself (crash before offset write)
    val out = fs(cons).create(new org.apache.hadoop.fs.Path(s"$cons/_OFFSET"), true)
    out.write("1,1".getBytes("UTF-8")); out.close()
    FeedConsumer.drainRollup(spark, up, cons, "k", "g", Seq("v"),
      nBuckets = 4, maxCatchupVersions = 2)
    assert(rollup(cons) == scratch(up), "the fallback redo must converge, not double-apply")
  }
}
