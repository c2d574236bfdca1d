package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._

/** HLL sketch invariants: mergeability (the whole point), estimator
  * accuracy in its regime, and edge behavior.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def regs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("ridx", "rmax").as[(Long, Long)].collect().toMap

  test("merge of arbitrary slices == sketch of the whole; replay is a no-op") {
    val whole = (0L until 20000L).toDF("k")
    val direct = regs(Sketches.hllSketch(whole, col("k")))
    val parts = (0 until 5).map(r => Sketches.hllSketch(whole.filter(col("k") % 5 === r), col("k")))
    val merged = regs(Sketches.hllMerge(parts.reduce(_ unionAll _)))
    assert(merged == direct)
    // merging a slice twice changes nothing (register max is idempotent)
    val replayed = regs(Sketches.hllMerge(parts.reduce(_ unionAll _).unionAll(parts.head)))
    assert(replayed == direct)
  }

  test("estimate is within 20% at n >> m, and flags the small-n regime") {
    val big = (0L until 50000L).toDF("k")
    val (est, nLow) = Sketches.hllEstimate(Sketches.hllSketch(big, col("k")))
      .as[(Long, Boolean)].head()
    assert(math.abs(est - 50000L) <= 10000L, s"est $est off by >20% of 50000")
    assert(!nLow, "50k keys must fill all 256 registers")
    val small = (0L until 40L).toDF("k")
    val (estS, nLowS) = Sketches.hllEstimate(Sketches.hllSketch(small, col("k")))
      .as[(Long, Boolean)].head()
    assert(nLowS, "40 keys cannot fill 256 registers")
    assert(estS >= 1L)
  }

  test("empty input estimates the raw-HLL floor and flags n_low") {
    val empty = Seq.empty[Long].toDF("k")
    val (est, nLow) = Sketches.hllEstimate(Sketches.hllSketch(empty, col("k")))
      .as[(Long, Boolean)].head()
    assert(est == Sketches.AlphaM2 / Sketches.HllM, s"expected alpha*m floor, got $est")
    assert(nLow)
  }

  test("grouped sketches estimate each cell independently") {
    val df = (0L until 30000L).map(i => (i, i % 3)).toDF("k", "g")
    val sk = Sketches.hllSketch(df, col("k"), groupCols = Seq("g"))
    (0L until 3L).foreach { g =>
      val (est, _) = Sketches.hllEstimate(sk.filter(col("g") === g).select("ridx", "rmax"))
        .as[(Long, Boolean)].head()
      assert(math.abs(est - 10000L) <= 2000L, s"group $g est $est off by >20% of 10000")
    }
    // the one-pass grouped estimator matches the per-cell global estimator
    val grouped = Sketches.hllEstimateGrouped(sk, Seq("g"))
      .as[(Long, Long, Boolean)].collect().map { case (g, e, l) => g -> (e, l) }.toMap
    (0L until 3L).foreach { g =>
      val single = Sketches.hllEstimate(sk.filter(col("g") === g).select("ridx", "rmax"))
        .as[(Long, Boolean)].head()
      assert(grouped(g) == single, s"group $g: grouped ${grouped(g)} != single $single")
    }
  }

  test("histogram: merge of slices == whole; counts conserved") {
    val whole = (1L to 9999L).toDF("k")
    val direct = Sketches.logHistogram(whole, col("k"))
      .as[(Long, Long)].collect().toMap
    val parts = (0 until 4).map(r =>
      Sketches.logHistogram(whole.filter(col("k") % 4 === r), col("k")))
    val merged = Sketches.histMerge(parts.reduce(_ unionAll _))
      .as[(Long, Long)].collect().toMap
    assert(merged == direct)
    assert(direct.values.sum == 9999L)
  }

  test("histogram quantile bounds contain the exact quantile, width <= 12.5%") {
    // skewed deterministic data: k^2 over 1..2000
    val df = (1L to 2000L).map(i => i * i).toDF("k")
    val hist = Sketches.histMerge(Sketches.logHistogram(df, col("k")))
    val qs = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
    val b = Sketches.histQuantileBounds(hist, qs).head()
    assert(b.getLong(0) == 2000L)
    val sorted = (1L to 2000L).map(i => i * i).sorted
    qs.zipWithIndex.foreach { case ((name, num, den), i) =>
      val pos = (2000L * num + den - 1L) / den
      val exact = sorted((pos - 1L).toInt)
      val (lo, hi) = (b.getLong(1 + 2 * i), b.getLong(2 + 2 * i))
      assert(exact >= lo && exact < hi, s"$name: exact $exact outside [$lo, $hi)")
      assert(lo < 16L || (hi - lo) * 8L <= lo, s"$name bucket [$lo, $hi) wider than 12.5%")
    }
  }

  test("grouped quantile bounds == per-group global bounds") {
    val df = (1L to 6000L).map(i => (i * i % 50021L, i % 4)).toDF("k", "g")
    val hist = Sketches.logHistogram(df, col("k"), groupCols = Seq("g"))
    val qs = Seq(("p50", 1L, 2L), ("p99", 99L, 100L))
    val grouped = Sketches.histQuantileBoundsGrouped(hist, Seq("g"), qs)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    (0L until 4L).foreach { g =>
      val single = Sketches.histQuantileBounds(
        hist.filter(col("g") === g).select("bucket", "cnt"), qs).head().toSeq
      assert(grouped(g) == single, s"group $g: ${grouped(g)} != $single")
    }
  }

  test("histogram identity region is exact below 16") {
    val df = Seq(0L, 1L, 3L, 3L, 15L).toDF("k")
    val hist = Sketches.logHistogram(df, col("k"))
    assert(hist.as[(Long, Long)].collect().toMap ==
      Map(0L -> 1L, 1L -> 1L, 3L -> 2L, 15L -> 1L))
    // 5 values, pos = 3 -> the third smallest (3), identity bucket [3, 4)
    val b = Sketches.histQuantileBounds(hist, Seq(("p50", 1L, 2L))).head()
    assert(b.getLong(1) == 3L && b.getLong(2) == 4L)
  }

  test("negative measures fail the histogram loudly") {
    val ex = intercept[Exception] {
      Sketches.logHistogram(Seq(-1L).toDF("k"), col("k")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("count-min: merge of slices == whole; total mass conserved per row") {
    val whole = (0L until 12000L).map(i => i % 300).toDF("k")
    val direct = Sketches.cmsSketch(whole, col("k"))
      .as[(Long, Long, Long)].collect().toSet
    val parts = (0 until 3).map(r =>
      Sketches.cmsSketch(whole.filter(col("k") % 3 === r), col("k")))
    val merged = Sketches.cmsMerge(parts.reduce(_ unionAll _))
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == direct)
    // every hash row holds exactly one increment per input row
    val perRow = merged.toSeq.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perRow == (0 until Sketches.CmsD).map(r => r.toLong -> 12000L).toMap)
  }

  test("count-min point query never undercounts, and is exact when cells are private") {
    val df = (0L until 12000L).map(i => i % 300).toDF("k") // each key x40
    val sketch = Sketches.cmsMerge(Sketches.cmsSketch(df, col("k")))
    val keys = (0L until 300L).toDF("k")
    val out = Sketches.cmsPointQuery(sketch, keys).as[(Long, Long)].collect().toMap
    assert(out.size == 300)
    assert(out.values.forall(_ >= 40L), "count-min must never undercount")
    // 300 keys in 512 cells collide sometimes, but min-over-4-rows should
    // leave most keys exact — a regression to one effective row would not
    val exact = out.values.count(_ == 40L)
    assert(exact >= 250, s"only $exact/300 keys exact — hash rows not independent?")
    // a key never sketched: estimate is whatever its cells carry, >= 0
    val ghost = Sketches.cmsPointQuery(sketch, Seq(99999L).toDF("k"))
      .as[(Long, Long)].head()
    assert(ghost._2 >= 0L)
  }

  test("ranks never exceed the cap") {
    val sk = Sketches.hllSketch((0L until 100000L).toDF("k"), col("k"))
    val mx = sk.agg(max("rmax")).as[Long].head()
    assert(mx <= Sketches.RankCap.toLong && mx >= 1L)
  }

  test("kmv: merge of arbitrary slices == sketch of the whole; replay is a no-op") {
    val df = (0L until 5000L).map(i => (i % 7, i)).toDF("slice", "k")
    val whole = Sketches.kmvSketch(df, col("k")).as[Long].collect().toSet
    val slices = Sketches.kmvSketch(df, col("k"), groupCols = Seq("slice"))
    val merged = Sketches.kmvMerge(slices.select("h")).as[Long].collect().toSet
    assert(merged == whole && merged.size == Sketches.KmvK)
    // replaying a slice into the merge changes nothing (re-min of mins)
    val replay = Sketches.kmvMerge(
      slices.select("h").unionAll(slices.filter(col("slice") === 3).select("h")))
      .as[Long].collect().toSet
    assert(replay == whole)
  }

  test("kmv estimate: exact below k, within 20% far above k") {
    val small = Sketches.kmvEstimate(
      Sketches.kmvSketch((0L until 100L).toDF("k"), col("k")))
      .as[(Long, Boolean)].head()
    assert(small == ((100L, true)))
    val big = Sketches.kmvEstimate(
      Sketches.kmvSketch((0L until 50000L).toDF("k"), col("k")))
      .as[(Long, Boolean)].head()
    assert(!big._2 && big._1 >= 40000L && big._1 <= 60000L,
      s"est ${big._1} outside the 20% band around 50000")
  }

  test("kmv intersection: estimator tracks the true overlap; exact when the union fits") {
    // A = [0, 30000), B = [15000, 45000): |A∩B| = 15000, |A∪B| = 45000
    val a = Sketches.kmvSketch((0L until 30000L).toDF("k"), col("k"))
    val b = Sketches.kmvSketch((15000L until 45000L).toDF("k"), col("k"))
    val r = Sketches.kmvIntersect2(a, b).as[(Long, Long, Long, Long, Long)].head()
    val (estA, estB, estU, hits, estI) = r
    assert(estU >= 36000L && estU <= 54000L, s"union est $estU")
    assert(estI >= 9000L && estI <= 21000L, s"intersection est $estI vs true 15000")
    assert(hits > 0L && estA > 0L && estB > 0L)
    // tiny sets: union fits in the sketch -> everything exact
    val ta = Sketches.kmvSketch((0L until 80L).toDF("k"), col("k"))
    val tb = Sketches.kmvSketch((50L until 130L).toDF("k"), col("k"))
    val t = Sketches.kmvIntersect2(ta, tb).as[(Long, Long, Long, Long, Long)].head()
    assert(t == ((80L, 80L, 130L, 30L, 30L)))
  }

  test("kmv on empty input: empty sketch, zero estimates") {
    val empty = Sketches.kmvSketch(Seq.empty[Long].toDF("k"), col("k"))
    assert(empty.count() == 0)
    val est = Sketches.kmvEstimate(empty).as[(Long, Boolean)].head()
    assert(est == ((0L, true)))
    val both = Sketches.kmvIntersect2(empty, empty)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(both == ((0L, 0L, 0L, 0L, 0L)))
  }
}
