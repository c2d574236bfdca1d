package graft

import graft.operators.Timeseries

/** Grid resample / forward fill on hand-checkable fixtures (the registry
  * row hash-verifies the full events table against DuckDB).
  */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Double)], step: Long) =
    Timeseries.resampleFfill(
      rows.toDF("k", "t", "id", "v"), "k", "t", "id", "v", step)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("grid_ts")) ->
        (r.getAs[Double]("value"), r.getAs[Long]("obs_ts"), r.getAs[Long]("age_ns")))
      .toMap

  test("forward fill carries the latest observation across gaps") {
    // key 1: obs at t=5 (v=1.0) and t=26 (v=2.0), step 10
    // grid points: 10, 20 carry the t=5 obs; none before first obs
    val g = run(Seq((1L, 5L, 1L, 1.0), (1L, 26L, 2L, 2.0)), step = 10L)
    assert(g.keySet == Set((1L, 10L), (1L, 20L)))
    assert(g((1L, 10L)) == ((1.0, 5L, 5L)))
    assert(g((1L, 20L)) == ((1.0, 5L, 15L)))
  }

  test("an observation exactly ON a grid point is carried with age 0") {
    val g = run(Seq((1L, 10L, 1L, 3.0), (1L, 15L, 2L, 4.0)), step = 10L)
    assert(g((1L, 10L)) == ((3.0, 10L, 0L)))
  }

  test("same-timestamp duplicates: the highest id wins the carry") {
    // a later observation extends the grid past t=10 (the grid never
    // extends beyond the last observation)
    val g = run(Seq((1L, 7L, 1L, 1.0), (1L, 7L, 2L, 9.0), (1L, 15L, 3L, 4.0)), step = 10L)
    assert(g((1L, 10L)) == ((9.0, 7L, 3L)))
  }

  test("a key whose whole history sits inside one step emits nothing") {
    // obs at 11..14: ceil(11/10)=2 > floor(14/10)=1 — no grid point
    val g = run(Seq((1L, 11L, 1L, 1.0), (1L, 14L, 2L, 2.0)), step = 10L)
    assert(g.isEmpty)
  }

  test("keys resample independently") {
    val g = run(Seq((1L, 5L, 1L, 1.0), (1L, 25L, 2L, 2.0),
      (2L, 95L, 3L, 7.0), (2L, 105L, 4L, 8.0)), step = 10L)
    assert(g.keySet == Set((1L, 10L), (1L, 20L), (2L, 100L)))
    assert(g((2L, 100L)) == ((7.0, 95L, 5L)))
  }

  private def runEwma(rows: Seq[(Long, Long, Long, Double)], num: Long, den: Long) =
    Timeseries.ewma(rows.toDF("k", "t", "id", "v"), "k", "t", "id", "v", num, den)
      .collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("ewma_u"), r.getAs[Double]("ewma"),
        r.getAs[Any]("delta"), r.getAs[Any]("pct_change")))
      .toMap

  test("ewma: alpha=1/2 recursion in micro-units, first value seeds") {
    // values 4, 8, 2: e1=4e6; e2=(8e6+4e6)/2=6e6; e3=(2e6+6e6)/2=4e6
    val r = runEwma(Seq((1L, 10L, 1L, 4.0), (1L, 20L, 2L, 8.0), (1L, 30L, 3L, 2.0)), 1L, 2L)
    assert(r(1L)._1 == 4000000L && r(2L)._1 == 6000000L && r(3L)._1 == 4000000L)
    assert(r(2L)._2 == 6.0)
  }

  test("ewma: per-step floor, exact micro-unit arithmetic") {
    // alpha=1/4: values 1, 2 -> e2 = (1*2e6 + 3*1e6) div 4 = 1_250_000
    // then value 0 -> e3 = (0 + 3*1_250_000) div 4 = 937_500
    val r = runEwma(Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 0.0)), 1L, 4L)
    assert(r(2L)._1 == 1250000L && r(3L)._1 == 937500L)
  }

  test("ewma: delta and pct_change guard zero and absent previous values") {
    val r = runEwma(Seq((1L, 1L, 1L, 0.0), (1L, 2L, 2L, 5.0), (1L, 3L, 3L, 4.0)), 1L, 2L)
    assert(r(1L)._3 == null && r(1L)._4 == null)         // no previous
    assert(r(2L)._3 == 5.0 && r(2L)._4 == null)          // previous is 0 -> pct null
    assert(r(3L)._3 == -1.0 && r(3L)._4 == -0.2)
  }

  test("ewma: keys fold independently, time order with id tie-break") {
    val r = runEwma(Seq((1L, 10L, 2L, 8.0), (1L, 10L, 1L, 4.0), (2L, 5L, 3L, 6.0)), 1L, 2L)
    // same t: id 1 first (seed 4e6), id 2 second -> 6e6; key 2 seeds alone
    assert(r(1L)._1 == 4000000L && r(2L)._1 == 6000000L && r(3L)._1 == 6000000L)
  }
}
