package graft

import graft.operators.Skew
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Physical-plan assertions for the scale paths: bucketed joins must be
  * shuffle-free; salted joins must be row-identical to plain joins.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("joining two same-bucketed tables plans WITHOUT a shuffle exchange") {
    val a = (1L to 500L).map(i => (i, i * 2.0)).toDF("k", "va")
    val b = (1L to 500L).map(i => (i, s"s$i")).toDF("k", "vb")
    Layout.writeBucketed(a, "graft_bspec_a", 4, "k", Seq("k"))
    Layout.writeBucketed(b, "graft_bspec_b", 4, "k", Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("graft_bspec_a").join(spark.table("graft_bspec_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupBy on the bucket key aggregates WITHOUT a shuffle exchange") {
    val agg = spark.table("graft_bspec_a").groupBy("k").agg(sum(col("va")))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(agg.count() == 500)
  }

  test("writeRangeClustered: per-file key ranges are pairwise disjoint") {
    val base = "target/tmp/layout_range_spec"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val rnd = new scala.util.Random(42)
    val df = (1 to 5000).map(_ => (rnd.nextLong().abs % 100000L, rnd.nextDouble()))
      .toDF("k", "v")
    Layout.writeRangeClustered(df, base, 8, "k")
    val files = new java.io.File(base).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // disjoint slices: every file's max < the next file's min (footer-level
    // skipping needs non-overlapping ranges)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ => ()
    }
    // roundtrip completeness
    assert(spark.read.parquet(base).count() == 5000)
  }

  test("saltedInnerJoin is row-identical to the plain join under heavy skew") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong))
      .toDF("k", "payload")
    val right = (1L to 200L).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "rv").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedInnerJoin(left, right, "k", saltFrom = "payload", nSalts = 8)
      .select("k", "payload", "rv").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
