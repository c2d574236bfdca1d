package graft

import graft.operators.BucketedSnapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-partitioned joins over the versioned bucketed table format
  * ([[graft.sources.SnapCatalog]]): two maintained tables bucketed on
  * the same key at the same arity join with ZERO exchanges; a mismatched
  * arity falls back to a normal shuffle plan with identical results;
  * outstanding delete vectors fold INSIDE the reader (so the
  * zero-exchange plan survives churn); aggregation on the bucket key
  * also plans exchange-free; and every SPJ read is row-identical to the
  * plain [[BucketedSnapshots.readSnapshot]].
  */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val path = s"target/tmp/spjspec_$name"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    path
  }

  private def shuffles(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  private def noBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val (pa, pb, pc) = {
    val a = fresh("a"); val b = fresh("b"); val c = fresh("c")
    BucketedSnapshots.upsertByKey(spark,
      (1L to 2000L).map(i => (i, i * 2.0)).toDF("k", "va"), a, "k", 16,
      keepVersions = 2)
    BucketedSnapshots.upsertByKey(spark,
      (1L to 1500L).map(i => (i, s"n$i")).toDF("k", "vb"), b, "k", 16,
      keepVersions = 2)
    BucketedSnapshots.upsertByKey(spark,
      (1L to 1000L).map(i => (i, i + 0.5)).toDF("k", "vc"), c, "k", 32,
      keepVersions = 2)
    // outstanding sidecars on a: keys 1..100 deleted, NOT compacted
    BucketedSnapshots.deleteKeys(spark, a,
      (1L to 100L).toDF("k"), "k", keepVersions = 2)
    (a, b, c)
  }

  test("same key, same arity: the join plans with ZERO exchanges (storage-partitioned join)") {
    noBroadcast {
      val j = BucketedSnapshots.readCurrentSPJ(spark, pa)
        .join(BucketedSnapshots.readCurrentSPJ(spark, pb), Seq("k"))
      assert(j.count() == 1400, "100 deleted keys must be folded out")
      assert(shuffles(j) == 0,
        s"SPJ join must shuffle NEITHER side:\n${j.queryExecution.executedPlan}")
    }
  }

  test("mismatched arity (16 vs 32) falls back to a shuffled plan with identical results") {
    noBroadcast {
      val j = BucketedSnapshots.readCurrentSPJ(spark, pa)
        .join(BucketedSnapshots.readCurrentSPJ(spark, pc), Seq("k"))
      assert(shuffles(j) >= 2, "incompatible arities must fall back to shuffles")
      assert(j.count() == 900) // keys 101..1000
    }
  }

  test("delete vectors fold inside the reader: SPJ rows == plain-read rows, key-pruned scans included") {
    val viaSpj = BucketedSnapshots.readCurrentSPJ(spark, pa)
    val plain = BucketedSnapshots.readCurrent(spark, pa)
    assert(viaSpj.except(plain).count() == 0 && plain.except(viaSpj).count() == 0)
    // prune the key away over the dv-laden table: the reader widens the
    // parquet schema internally and narrows rows back
    val s = viaSpj.select("va").agg(sum("va")).collect()(0).getDouble(0)
    assert(s == (101L to 2000L).map(_ * 2.0).sum)
  }

  test("aggregation on the bucket key plans exchange-free through the reported partitioning") {
    val g = BucketedSnapshots.readCurrentSPJ(spark, pa)
      .groupBy("k").agg(count(lit(1)).as("n"))
    assert(g.count() == 1900)
    assert(shuffles(g) == 0,
      s"groupBy(bucket key) must reuse the storage partitioning:\n${g.queryExecution.executedPlan}")
  }

  test("filters still reach the parquet scan through the SPJ read path") {
    val f = BucketedSnapshots.readCurrentSPJ(spark, pb).filter($"k" === 500L)
    assert(f.collect().map(_.getString(1)).toSeq == Seq("n500"))
    val plan = f.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"expected the DSv2 scan:\n$plan")
  }

  test("a pinned old version reads through SPJ too (immutable identifier)") {
    val path = fresh("pin")
    val v1 = BucketedSnapshots.upsertByKey(spark,
      (1L to 50L).map(i => (i, i)).toDF("k", "n"), path, "k", 4, keepVersions = 3)
    BucketedSnapshots.upsertByKey(spark,
      Seq((1L, 999L)).toDF("k", "n"), path, "k", 4, keepVersions = 3)
    val old = BucketedSnapshots.readSnapshotSPJ(spark, path, v1)
      .as[(Long, Long)].collect().toMap
    assert(old(1L) == 1L && old.size == 50)
    val cur = BucketedSnapshots.readCurrentSPJ(spark, path)
      .as[(Long, Long)].collect().toMap
    assert(cur(1L) == 999L)
  }
}
