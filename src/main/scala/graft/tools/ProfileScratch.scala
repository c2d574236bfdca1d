package graft.tools

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level profiler for bench investigations (not part of the
  * library surface): times named sub-stages of a query in isolation so a
  * regression can be attributed to the stage that actually moved. Kept in
  * the repo because every perf round needs one; edit the stages freely.
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt(name: String, warm: Int = 6)(f: => Long): Unit = {
      val ts = (0 until warm).map { i =>
        val t0 = System.nanoTime
        val n = f
        val dt = (System.nanoTime - t0) / 1e9
        System.err.println(f"[prof] $name run$i rows=$n $dt%.2f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
        dt
      }
      val med = ts.drop(1).sorted.apply((warm - 1) / 2)
      System.err.println(f"[prof] $name MEDIAN(warm) $med%.2f s")
    }

    // same shape as TrainingQueries.augmentedDocs (private there)
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val docs = base.unionByName(
      base.filter(col("doc_id") < 25).select(
        (col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" xq")).as("text")))

    timeIt("scan_text_only") {
      docs.select(length(col("text"))).agg(sum("length(text)")).count()
    }
    timeIt("simhash_sig_md5") {
      Dedup.simhash(docs, "doc_id", "text", Dedup.Md5ShingleHash).count()
    }
    timeIt("simhash_sig_xx") {
      Dedup.simhash(docs, "doc_id", "text", Dedup.XxShingleHash).count()
    }
    timeIt("simhash_pairs_md5") {
      Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3, tokenHash = Dedup.Md5ShingleHash).count()
    }
    timeIt("simhash_pairs_md5_lazy") {
      Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3, tokenHash = Dedup.Md5ShingleHash,
        boundary = graft.operators.Boundary.None).count()
    }
    spark.stop()
  }
}
