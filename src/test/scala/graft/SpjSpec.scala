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

  test("mismatched arity (16 vs 32) re-shuffles exactly ONE side to the other's layout, identical results") {
    noBroadcast { noAqe {
      val j = BucketedSnapshots.readCurrentSPJ(spark, pa)
        .join(BucketedSnapshots.readCurrentSPJ(spark, pc), Seq("k"))
      // incompatible arities can't co-locate for free: one side must
      // exchange (pre-r16 both did, via hash; with v2.bucketing.shuffle
      // one side re-buckets to the other's KeyGroupedPartitioning —
      // strictly fewer bytes moved)
      val exchanges = planTree(j).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"exactly one side must re-bucket:\n${planTree(j)}")
      assert(exchanges.head.outputPartitioning.toString.contains("keygroupedpartitioning"),
        "the re-bucket must target the other side's KeyGroupedPartitioning, not a plain hash")
      assert(j.count() == 900) // keys 101..1000
    } }
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

  private def noAqe[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** The physical plan with exchanges as EnsureRequirements placed them.
    * ONLY inspectable with AQE off: under AQE the walkable
    * `AdaptiveSparkPlanExec.inputPlan` PRECEDES EnsureRequirements — a
    * tree walk over it finds zero exchanges in ANY join and every
    * exchange-count assertion passes vacuously (the r16 bug this guard
    * exists to keep out).
    */
  private def planTree(df: DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    val p = df.queryExecution.executedPlan
    assert(!p.isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec],
      "wrap plan-shape assertions in noAqe {} — AQE hides EnsureRequirements' placement")
    p
  }

  /** Shuffle exchanges whose subtree contains the DSv2 scan — the
    * maintained-table side re-shuffling SPJ exists to eliminate.
    */
  private def exchangesAboveScan(p: org.apache.spark.sql.execution.SparkPlan): Int =
    p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.collectFirst {
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
          }.isDefined => e
    }.size

  test("one-sided SPJ: a derived delta joins the maintained table with ZERO " +
    "exchanges on the table side (v2.bucketing.shuffle)") {
    noBroadcast { noAqe {
      val delta = (1L to 300L).map(i => (i, 1.0)).toDF("k", "d")
        .groupBy("k").agg(sum("d").as("dv"))
      val j = delta.join(BucketedSnapshots.readCurrentSPJ(spark, pa), Seq("k"), "left")
      assert(j.count() == 300)
      val p = planTree(j)
      assert(exchangesAboveScan(p) == 0,
        s"the maintained side must NOT re-shuffle — only the delta side:\n$p")
      // ...and the delta side DID shuffle into the table's layout (the
      // plan is one-sided, not magically exchange-free)
      assert(p.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.exists(_.outputPartitioning.toString.contains("keygroupedpartitioning")),
        s"the delta side must re-bucket to the table's KeyGroupedPartitioning:\n$p")
    } }
  }

  test("bucket-subset identifier reads exactly those buckets' (dv-folded) rows") {
    val v = BucketedSnapshots.currentVersion(spark, pa).get
    val m = BucketedSnapshots.readManifest(spark, pa, v)
    val subset = m.keySet.toSeq.sorted.take(5)
    val viaSubset = BucketedSnapshots.readSnapshotSPJBuckets(spark, pa, v, subset)
    val plain = BucketedSnapshots.readCurrent(spark, pa)
      .filter(pmod(xxhash64(col("k")), lit(16L)).cast("int").isin(subset.map(Int.box): _*))
    assert(viaSubset.except(plain).count() == 0 && plain.except(viaSubset).count() == 0,
      "subset SPJ read must equal the plain read restricted to those buckets")
  }

  test("merge commits route their existing side through the SPJ catalog " +
    "(the serve-merge / upsert 100 TB shape)") {
    val path = fresh("mergespj")
    BucketedSnapshots.upsertByKey(spark,
      (1L to 500L).map(i => (i, i * 1.0)).toDF("k", "v"), path, "k", 8,
      keepVersions = 2)
    val before = BucketedSnapshots.spjMergeReads.get()
    BucketedSnapshots.upsertByKey(spark,
      (1L to 50L).map(i => (i, -i * 1.0)).toDF("k", "v"), path, "k", 8,
      keepVersions = 2)
    assert(BucketedSnapshots.spjMergeReads.get() > before,
      "the second commit's existing side must read through the SPJ catalog")
    val got = BucketedSnapshots.readCurrent(spark, path)
      .as[(Long, Double)].collect().toMap
    assert(got.size == 500 && got(5L) == -5.0 && got(400L) == 400.0,
      "merge values must be unchanged by the SPJ routing")
  }

  test("feed-consumer pinned-base join: the rollup table side plans exchange-free") {
    val path = fresh("rollup")
    val init = (1L to 300L).map(i => (s"g${i % 30}", 1L, i)).toDF("g", "one", "m")
      .groupBy("g").agg(sum("one").as("n"), sum("m").as("sum_m"))
      .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
    val v = BucketedSnapshots.applyChanges(spark, init, path, "g", 8)
    noBroadcast { noAqe {
      val delta = (1L to 40L).map(i => (s"g${i % 30}", 1L, i * 10L)).toDF("g", "dn", "dm")
        .groupBy("g").agg(sum("dn").as("d_n"), sum("dm").as("d_m"))
      val next = graft.operators.FeedConsumer.nextRollup(
        delta, BucketedSnapshots.readTableAtSPJ(spark, path, v), "g", Seq("m"))
      assert(exchangesAboveScan(planTree(next)) == 0,
        s"the pinned rollup base must not shuffle:\n${planTree(next)}")
      val plain = graft.operators.FeedConsumer.nextRollup(
        delta, BucketedSnapshots.readTableAt(spark, path, v), "g", Seq("m"))
      assert(next.except(plain).count() == 0 && plain.except(next).count() == 0,
        "SPJ and plain pinned-base joins must be row-identical")
    } }
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
