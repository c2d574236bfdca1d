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
  }

  test("ranks never exceed the cap") {
    val sk = Sketches.hllSketch((0L until 100000L).toDF("k"), col("k"))
    val mx = sk.agg(max("rmax")).as[Long].head()
    assert(mx <= Sketches.RankCap.toLong && mx >= 1L)
  }
}
