package graft

import graft.operators.Similarity
import graft.sources.Layout
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVF index-at-rest lifecycle: build / frozen-centroid append /
  * drift-triggered rebuild, and the two-rename swap's crash contract.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, Array.tabulate(8)(j =>
      math.sin(i * 3.7 + j * 1.3) + (if (i % 3 == 0) 2.0 else 0.0))))
      .toDF("vec_id", "embedding")

  private def fs = new Path("target").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def indexRows(root: String): Set[(Long, Long)] =
    spark.read.parquet(s"$root/index").select("cell_id", "vec_id")
      .as[(Long, Long)].collect().toSet

  private def centroidRows(root: String): Map[Long, Seq[Double]] =
    spark.read.parquet(s"$root/centroids").select("cell_id", "centroid")
      .as[(Long, Seq[Double])].collect().toMap

  test("append…append+rebuild == fresh build of the merged corpus") {
    val all = (1L to 90L)
    val base = vecs(all.filter(_ % 10 < 6))
    val b1 = vecs(all.filter(i => i % 10 == 6 || i % 10 == 7))
    val b2 = vecs(all.filter(_ % 10 >= 8))
    val merged = vecs(all)
    val lived = "target/tmp/ivfspec_lived"
    val freshR = "target/tmp/ivfspec_fresh"
    Seq(lived, freshR).foreach(r => fs.delete(new Path(r), true))
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", lived, nCentroids = 4, kmeansIters = 0)
    val r1 = Similarity.ivfAppend(spark, b1, "vec_id", "embedding", lived, rebuildFactor = 1000)
    assert(!r1.select("rebuild").head.getBoolean(0), "huge factor must not fire")
    // after the first append, the index holds base+b1 under frozen centroids
    assert(indexRows(lived).map(_._2) == all.filter(_ % 10 < 8).toSet)
    val r2 = Similarity.ivfAppend(spark, b2, "vec_id", "embedding", lived, rebuildFactor = 1)
    assert(r2.select("rebuild").head.getBoolean(0), "factor 1 fires on any skew")
    Similarity.ivfRebuild(merged, "vec_id", "embedding", lived, nCentroids = 4, kmeansIters = 2)
    Similarity.ivfWriteIndex(merged, "vec_id", "embedding", freshR, nCentroids = 4, kmeansIters = 2)
    // deterministic clustering -> the lived-in index equals the fresh one
    // exactly, assignments AND centroids
    assert(indexRows(lived) == indexRows(freshR))
    assert(centroidRows(lived) == centroidRows(freshR))
    // the swap left no litter behind
    assert(!fs.exists(new Path(lived + "__staging")) && !fs.exists(new Path(lived + "__old")))
  }

  test("a crash between the two renames leaves a complete old index to recover") {
    val root = "target/tmp/ivfspec_crash"
    fs.delete(new Path(root), true)
    val base = vecs(1L to 40L)
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", root, nCentroids = 4, kmeansIters = 0)
    val before = (indexRows(root), centroidRows(root))
    // simulate the swap's crash window by hand: staging fully written,
    // root moved aside, CRASH before the commit rename
    val staging = root + "__staging"
    Similarity.ivfWriteIndex(vecs(1L to 60L), "vec_id", "embedding", staging,
      nCentroids = 4, kmeansIters = 1)
    assert(fs.rename(new Path(root), new Path(root + "__old")))
    // the table path is absent (readers fail and retry, per the contract)…
    assert(!fs.exists(new Path(root)))
    // …but the OLD index is complete and readable at __old
    assert((indexRows(root + "__old"), centroidRows(root + "__old")) == before)
    // mechanical recovery: rename it back; content identical to pre-crash
    assert(fs.rename(new Path(root + "__old"), new Path(root)))
    assert((indexRows(root), centroidRows(root)) == before)
    // …and the real swap over the recovered root completes cleanly
    fs.delete(new Path(staging), true)
    Similarity.ivfRebuild(vecs(1L to 60L), "vec_id", "embedding", root,
      nCentroids = 4, kmeansIters = 1)
    assert(indexRows(root).map(_._2) == (1L to 60L).toSet)
    assert(!fs.exists(new Path(root + "__staging")) && !fs.exists(new Path(root + "__old")))
  }
}
