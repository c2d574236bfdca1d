package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Zone-map manifest: driver-side file pruning must be a pure optimization
  * — same rows as the full scan, strictly fewer files opened.
  */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private val path = "target/tmp/zonemap_spec"

  private def build(): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val df = (0L until 10000L).map(i => (i, s"v$i", i % 97)).toDF("k", "v", "g")
    Layout.writeZoneMapped(df, path, nFiles = 8, rangeCol = "k", statsCols = Seq("g"))
  }

  test("pruned read == full-scan filter, on a strict subset of files") {
    build()
    val lo = 2500L; val hi = 3100L
    val pruned = Layout.readZonePruned(spark, path, "k", lo, hi)
    val full = spark.read.parquet(path).filter(col("k").between(lo, hi))
    assert(pruned.select("k", "v", "g").as[(Long, String, Long)].collect().sorted.toSeq ==
      full.select("k", "v", "g").as[(Long, String, Long)].collect().sorted.toSeq)
    val all = Layout.zonePrunedFiles(spark, path, "k", Long.MinValue, Long.MaxValue)
    val hit = Layout.zonePrunedFiles(spark, path, "k", lo, hi)
    assert(all.size == 8, s"expected 8 files, zone map lists ${all.size}")
    assert(hit.size < all.size, s"range touching <10% of keys pruned nothing (${hit.size}/${all.size})")
    assert(hit.nonEmpty)
  }

  test("secondary stats column prunes too; unknown column fails fast") {
    build()
    // g = k % 97 scatters across every range-clustered file: zones are wide,
    // so a g-range prunes little or nothing — but the result must still match
    val pruned = Layout.readZonePruned(spark, path, "g", 10L, 12L)
    val full = spark.read.parquet(path).filter(col("g").between(10L, 12L))
    assert(pruned.count() == full.count())
    val ex = intercept[IllegalArgumentException] {
      Layout.zonePrunedFiles(spark, path, "v", 0L, 1L)
    }
    assert(ex.getMessage.contains("no stats"))
  }

  test("buildZoneMap over a z-ordered table prunes rectangles on both dimensions") {
    val zp = "target/tmp/zonemap_zorder_spec"
    val p = new org.apache.hadoop.fs.Path(zp)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val df = (0L until 16384L).map(i => (i % 128, i / 128)).toDF("a", "b")
    Layout.writeZOrdered(df, zp, nFiles = 16, colA = "a", colB = "b", bits = 7)
    Layout.buildZoneMap(spark, zp, Seq("a", "b"))
    val all = Layout.zonePrunedFiles(spark, zp, "a", Long.MinValue, Long.MaxValue)
    val hitA = Layout.zonePrunedFiles(spark, zp, "a", 0L, 15L)
    val hitB = Layout.zonePrunedFiles(spark, zp, "b", 0L, 15L)
    assert(all.size == 16)
    assert(hitA.size < all.size, s"a-range pruned nothing (${hitA.size}/16)")
    assert(hitB.size < all.size, s"b-range pruned nothing (${hitB.size}/16)")
    // rectangle = the manifest-level intersection of both pruned sets
    val rect = hitA.toSet intersect hitB.toSet
    assert(rect.size <= math.min(hitA.size, hitB.size))
    val out = spark.read.parquet(rect.toSeq: _*)
      .filter(col("a").between(0L, 15L) && col("b").between(0L, 15L))
    assert(out.count() ==
      df.filter(col("a").between(0L, 15L) && col("b").between(0L, 15L)).count())
  }

  test("a missing manifest degrades to the unpruned scan, never an error") {
    build()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, Layout.ZoneMapFile), false)
    val out = Layout.readZonePruned(spark, path, "k", 100L, 200L)
    assert(out.count() == 101L)
  }

  test("empty intersection returns a schema-bearing empty frame") {
    build()
    val out = Layout.readZonePruned(spark, path, "k", 100000L, 200000L)
    assert(out.columns.toSeq == Seq("k", "v", "g"))
    assert(out.count() == 0L)
  }
}
