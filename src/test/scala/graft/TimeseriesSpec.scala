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
}
