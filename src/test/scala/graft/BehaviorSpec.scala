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

  test("timed funnel: epoch-nanos timestamps + a large finite gap cannot overflow the window check") {
    // prev + maxStepGap would wrap long (4e18 + 6e18); the difference form
    // must still count the conversion that lands 1ns after the first step
    val base = 4000000000000000000L
    val ev = Seq(
      (1L, "A", base), (1L, "B", base + 1L),
      // u2's B lands OUTSIDE the gap: must not count
      (2L, "A", 10L), (2L, "B", 9223372036854775000L)
    ).toDF("user_id", "event_type", "ts")
    val r = Behavior.funnel(ev, "user_id", "event_type", "ts", Seq("A", "B"),
      maxStepGap = 6000000000000000000L)
      .collect().map(x => x.getAs[Long]("user_id") -> x.getAs[Int]("reached")).toMap
    assert(r(1L) == 2, "in-window conversion dropped — the gap check overflowed")
    assert(r(2L) == 1)
  }

  test("sequenceMatch gapped == funnel on chain patterns (property, random streams)") {
    val rnd = new scala.util.Random(42)
    val types = Seq("A", "B", "C", "D")
    val ev = (0 until 2000).map { i =>
      (i.toLong, rnd.nextInt(40).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(50).toLong) // coarse ts: plenty of exact-tie collisions
    }.toDF("event_id", "user_id", "event_type", "ts")
    Seq(Seq("A", "B"), Seq("A", "B", "C"), Seq("D", "A", "D", "B")).foreach { pat =>
      val viaFold = Behavior.sequenceMatch(ev, "user_id", "event_type", "ts", "event_id",
        pat, contiguous = false).collect()
        .map(r => r.getLong(0) -> (1 to pat.size).map(k => r.getAs[Any](s"t$k")))
        .toMap
      val viaFunnel = Behavior.funnel(ev, "user_id", "event_type", "ts", pat).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((1 to pat.size).map(k => r.getAs[Any](s"t$k")), r.getAs[Int]("reached")))
        .toMap
      assert(viaFold.keySet == viaFunnel.keySet, s"user sets differ for $pat")
      viaFold.foreach { case (u, ts) =>
        assert(ts == viaFunnel(u)._1, s"user $u pattern $pat: fold $ts vs funnel ${viaFunnel(u)._1}")
      }
      // matched flag agrees with full reach
      val matched = Behavior.sequenceMatch(ev, "user_id", "event_type", "ts", "event_id",
        pat, contiguous = false).collect()
        .map(r => r.getLong(0) -> r.getAs[Boolean]("matched")).toMap
      matched.foreach { case (u, f) => assert(f == (viaFunnel(u)._2 == pat.size)) }
    }
  }

  test("sequenceMatch contiguous requires adjacency; earliest start wins; id breaks ts ties") {
    val ev = Seq(
      // u1: A B C adjacent at the head -> matches (10,20,30)
      (1L, 1L, "A", 10L), (2L, 1L, "B", 20L), (3L, 1L, "C", 30L), (4L, 1L, "A", 40L),
      // u2: A x B — gapped would match A..B..C, contiguity must refuse
      (5L, 2L, "A", 10L), (6L, 2L, "D", 15L), (7L, 2L, "B", 20L), (8L, 2L, "C", 25L),
      // u3: two starts; the later full match must lose to nothing —
      // first A B C run is at (50,60,70) after a decoy A at 5
      (9L, 3L, "A", 5L), (10L, 3L, "D", 6L),
      (11L, 3L, "A", 50L), (12L, 3L, "B", 60L), (13L, 3L, "C", 70L),
      // u4: ts tie at 10 — event_id order makes A(id 14) precede B(id 15)
      (14L, 4L, "A", 10L), (15L, 4L, "B", 10L), (16L, 4L, "C", 11L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val r = Behavior.sequenceMatch(ev, "user_id", "event_type", "ts", "event_id",
      Seq("A", "B", "C"), contiguous = true).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Any]("t1"), x.getAs[Any]("t2"), x.getAs[Any]("t3"),
          x.getAs[Boolean]("matched"))).toMap
    assert(r(1L) == ((10L, 20L, 30L, true)))
    assert(r(2L) == ((null, null, null, false)), "intervening event must break adjacency")
    assert(r(3L) == ((50L, 60L, 70L, true)))
    assert(r(4L) == ((10L, 10L, 11L, true)), "id order resolves the ts tie")
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

  test("sessionize: gap strictly greater than gapNs starts a new session; ties share") {
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 5L), (1L, 3L, 10L), // gaps 5,5 <= 5: one session
      (1L, 4L, 16L),                             // gap 6 > 5: new session
      (2L, 5L, 100L),                            // single event = its own session
      (2L, 6L, 100L)                             // equal ts: same session, id tie-break
    ).toDF("user_id", "event_id", "ts")
    val r = Behavior.sessionize(ev, "user_id", "ts", "event_id", 5L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(r == Set(
      (1L, 1L, 0L, 10L, 3L, 10L),
      (1L, 2L, 16L, 16L, 1L, 0L),
      (2L, 1L, 100L, 100L, 2L, 0L)))
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

  test("robust anomalies: median/MAD flags the outlier a mean-based rule would chase") {
    // u1: values 10,11,12,13,1000 — med=12, deviations {2,1,0,1,988},
    // MAD=1 (discrete lower-middle of {0,1,1,2,988}); only 1000 exceeds 3 MADs
    val ev = Seq((1L, 1L, 10.0), (1L, 2L, 11.0), (1L, 3L, 12.0),
      (1L, 4L, 13.0), (1L, 5L, 1000.0)).toDF("user_id", "event_id", "value")
    val r = Behavior.robustAnomalies(ev, "user_id", "event_id", "value", 3L, 1L)
      .collect().map(x => x.getAs[Long]("event_id") ->
        (x.getAs[Double]("med"), x.getAs[Double]("mad"), x.getAs[Boolean]("is_anomaly"))).toMap
    assert(r.size == 5 && r.values.forall(v => v._1 == 12.0 && v._2 == 1.0))
    assert(r.filter(_._2._3).keySet == Set(5L))
  }

  test("robust anomalies: mad=0 keys flag ANY nonzero deviation") {
    // over half the values identical -> MAD collapses to 0
    val ev = Seq((1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 5.0), (1L, 4L, 5.1))
      .toDF("user_id", "event_id", "value")
    val r = Behavior.robustAnomalies(ev, "user_id", "event_id", "value", 3L, 1L)
      .collect().map(x => x.getAs[Long]("event_id") -> x.getAs[Boolean]("is_anomaly")).toMap
    assert(r == Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("winsorize clamps into the discrete [p, 1-p] range; tiny keys are a no-op") {
    // key A: values 1..20, p=1/10 -> loRank=2, hiRank=19: clamp to [2, 19]
    val a = (1 to 20).map(i => (1L, i.toLong, i.toDouble))
    // key B: 3 values, loRank = max(1, ceil(3/10)) = 1, hiRank = 3 -> [min, max], no-op
    val b = Seq((2L, 100L, 7.0), (2L, 101L, -4.0), (2L, 102L, 50.0))
    val r = Behavior.winsorize((a ++ b).toDF("k", "id", "v"), "k", "id", "v", 1L, 10L)
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Double]("lo"), x.getAs[Double]("hi"), x.getAs[Double]("value_winsorized")))
      .toMap
    assert(r(1L) == ((2.0, 19.0, 2.0)))    // clamped up
    assert(r(20L) == ((2.0, 19.0, 19.0)))  // clamped down
    assert(r(10L) == ((2.0, 19.0, 10.0)))  // inside: untouched
    assert(r(101L) == ((-4.0, 50.0, -4.0)) && r(102L) == ((-4.0, 50.0, 50.0)))
  }

  test("typeEntropy: 0 bits for one type, log2(k) for a uniform spread") {
    val ev = (Seq.fill(8)((1L, "a")) ++
      Seq((2L, "a"), (2L, "b"), (2L, "c"), (2L, "d"))).toDF("user_id", "event_type")
    val r = Behavior.typeEntropy(ev, "user_id", "event_type")
      .collect().map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("n_events"), x.getAs[Long]("n_types"), x.getAs[Double]("entropy")))
      .toMap
    assert(r(1L) == ((8L, 1L, 0.0)))
    assert(r(2L)._2 == 4L && math.abs(r(2L)._3 - 2.0) < 1e-6) // uniform over 4 = 2 bits
  }

  test("giniByGroup: 0 when equal, (n-1)/n when one key holds everything") {
    val ev = (Seq((1L, "g1", 5.0), (2L, "g1", 5.0), (3L, "g1", 5.0), (4L, "g1", 5.0)) ++
      Seq((1L, "g2", 0.0), (2L, "g2", 0.0), (3L, "g2", 0.0), (4L, "g2", 12.0)) ++
      Seq((1L, "g3", 0.0), (2L, "g3", 0.0))).map(t => (t._2, t._1, t._3))
      .toDF("grp", "k", "v")
    val r = Behavior.giniByGroup(ev, "grp", "k", "v")
      .collect().map(x => x.getAs[String]("grp") ->
        (x.getAs[Long]("n_keys"), x.getAs[Any]("gini"))).toMap
    assert(r("g1") == ((4L, 0.0)))
    assert(r("g2") == ((4L, 0.75))) // (n-1)/n = 3/4
    assert(r("g3")._2 == null)      // zero total -> undefined
    intercept[Exception] {
      Behavior.giniByGroup(Seq(("g", 1L, -2.0)).toDF("grp", "k", "v"), "grp", "k", "v")
        .collect()
    }
  }

  test("robust anomalies: threshold is a rational num/den pair") {
    // u1: values 0,10,21 — med=10, devs {10,0,11}, MAD=10; at 21/20 MADs
    // (1.05) the dev=11 rows flag, dev=10 does not (11*20 > 10*21, 10*20 < 10*21)
    val ev = Seq((1L, 1L, 0.0), (1L, 2L, 10.0), (1L, 3L, 21.0))
      .toDF("user_id", "event_id", "value")
    val r = Behavior.robustAnomalies(ev, "user_id", "event_id", "value", 21L, 20L)
      .collect().map(x => x.getAs[Long]("event_id") -> x.getAs[Boolean]("is_anomaly")).toMap
    assert(r == Map(1L -> false, 2L -> false, 3L -> true))
  }
}
