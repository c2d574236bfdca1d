package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._

/** Behavioral analytics on hand-checkable fixtures (the registry rows
  * hash-verify the full fixture tables against DuckDB).
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("funnel keeps partial chains and enforces strict ordering") {
    val ev = Seq(
      // u1 completes A(10) -> B(20) -> C(30)
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      // u2 stalls after A: the B precedes A, so it cannot count
      (2L, "B", 5L), (2L, "A", 10L),
      // u3 reaches B; its C at the SAME time as B must not count (strict >)
      (3L, "A", 1L), (3L, "B", 7L), (3L, "C", 7L),
      // u4 never does A, even with B and C present
      (4L, "B", 2L), (4L, "C", 3L)
    ).toDF("user_id", "event_type", "ts")
    val r = Behavior.funnel(ev, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .collect().map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Any]("t1"), x.getAs[Any]("t2"), x.getAs[Any]("t3"), x.getAs[Int]("reached")))
      .toMap
    assert(r(1L) == ((10L, 20L, 30L, 3)))
    assert(r(2L) == ((10L, null, null, 1)))
    assert(r(3L) == ((1L, 7L, null, 2)))
    assert(r(4L) == ((null, null, null, 0)))
  }

  test("retention cohorts: offsets anchor at each user's first day, offset 0 counts the cohort") {
    val ev = Seq((1L, 100L), (1L, 102L), (2L, 100L), (2L, 100L), (3L, 101L), (3L, 102L))
      .toDF("user_id", "day")
    val r = Behavior.retentionCohorts(ev, "user_id", "day")
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((100L, 0L, 2L), (100L, 2L, 1L), (101L, 0L, 1L), (101L, 1L, 1L)))
  }

  test("transition matrix: per-user ordered transitions, probabilities normalize per source") {
    val ev = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"), // A->B, B->A
      (2L, 4L, 1L, "A"), (2L, 5L, 2L, "B"),                    // A->B
      (3L, 6L, 1L, "C")                                        // no transition
    ).toDF("user_id", "event_id", "ts", "event_type")
    val r = graft.operators.Behavior
      .transitionMatrix(ev, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Double)].collect().toSet
    assert(r == Set(("A", "B", 2L, 1.0), ("B", "A", 1L, 1.0)))
  }

  test("time-weighted average weights values by holding duration, not event count") {
    // value 10 held for 9 units, then a burst of value 0 for 1 unit:
    // plain avg of events = (10+0+0)/3; twab = (10*9 + 0*1) / 10 = 9.0
    val ev = Seq((1L, 1L, 0L, 10.0), (1L, 2L, 9L, 0.0), (1L, 3L, 10L, 0.0))
      .toDF("user_id", "event_id", "ts", "value")
    val r = Behavior.timeWeightedAvg(ev, "user_id", "ts", "event_id", "value")
      .as[(Long, Double, Long)].head()
    assert(r == ((1L, 9.0, 10L)))
    // single-event users have no held duration: excluded
    val one = Seq((7L, 1L, 0L, 5.0)).toDF("user_id", "event_id", "ts", "value")
    assert(Behavior.timeWeightedAvg(one, "user_id", "ts", "event_id", "value").count() == 0)
  }
}
