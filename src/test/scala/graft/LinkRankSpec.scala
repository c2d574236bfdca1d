package graft

import graft.operators.LinkRank
import org.apache.spark.sql.functions._

/** Integer-unit PageRank: structural properties a hand-checkable graph
  * pins down exactly (the registry row `graph_link_rank` hash-verifies the
  * full unrolled iteration against DuckDB).
  */
class LinkRankSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (String, String, Long)*) = es.toDF("src", "dst", "w")

  test("a symmetric two-node graph splits rank mass equally") {
    val r = LinkRank.pageRank(edges(("a", "b", 1L), ("b", "a", 1L)), iters = 3)
      .select("node", "rank_u").as[(String, Long)].collect().toMap
    assert(r.keySet == Set("a", "b"))
    assert(r("a") == r("b"))
    // total mass conserved up to the documented floor leak
    assert(math.abs(r.values.sum - LinkRank.UNIT) <= 16L * (2 + 2) * 3)
  }

  test("the hub of a star graph outranks every leaf, leaves tie") {
    val star = edges(
      ("hub", "l1", 1L), ("l1", "hub", 1L),
      ("hub", "l2", 1L), ("l2", "hub", 1L),
      ("hub", "l3", 1L), ("l3", "hub", 1L))
    val r = LinkRank.pageRank(star, iters = 3)
      .select("node", "rank_u").as[(String, Long)].collect().toMap
    assert(r("hub") > r("l1"))
    assert(r("l1") == r("l2") && r("l2") == r("l3"))
  }

  test("edge weights steer rank: the heavier-cited node wins") {
    // s cites a with weight 9, b with weight 1; back-edges keep s ranked
    val g = edges(("s", "a", 9L), ("s", "b", 1L), ("a", "s", 1L), ("b", "s", 1L))
    val r = LinkRank.pageRank(g, iters = 3)
      .select("node", "rank_u").as[(String, Long)].collect().toMap
    assert(r("a") > r("b"))
  }

  test("empty edge set yields an empty typed result") {
    val r = LinkRank.pageRank(edges().where(lit(false)), iters = 3)
    assert(r.columns.toSeq == Seq("node", "rank_u", "delta_u"))
    assert(r.count() == 0)
  }

  test("iters=16 (boundary): L1 step norm shrinks as iterations deepen") {
    // a mildly asymmetric strongly-connected graph: converges geometrically
    val g = edges(("a", "b", 3L), ("b", "c", 2L), ("c", "a", 1L),
      ("a", "c", 1L), ("c", "b", 1L))
    def l1(iters: Int): Long = LinkRank.pageRank(g, iters)
      .agg(sum("delta_u")).head.getLong(0)
    val (early, mid, late) = (l1(2), l1(8), l1(16))
    assert(early > mid && mid >= late, s"L1 deltas $early/$mid/$late not shrinking")
    // at 16 iterations the step norm is tiny relative to total mass
    assert(late < LinkRank.UNIT / 10000, s"late L1 delta $late too large")
    // and ranks themselves are stable between 15 and 16 iterations
    val r15 = LinkRank.pageRank(g, 15).select("node", "rank_u").as[(String, Long)].collect().toMap
    val r16 = LinkRank.pageRank(g, 16).select("node", "rank_u").as[(String, Long)].collect().toMap
    assert(r15.keySet == r16.keySet)
    assert(r15.keys.map(k => math.abs(r15(k) - r16(k))).sum == late)
  }

  test("weights above MaxWeight or non-positive are rejected up front") {
    val big = intercept[IllegalArgumentException] {
      LinkRank.pageRank(edges(("a", "b", LinkRank.MaxWeight + 1), ("b", "a", 1L)), iters = 1)
    }
    assert(big.getMessage.contains("MaxWeight"))
    val neg = intercept[IllegalArgumentException] {
      LinkRank.pageRank(edges(("a", "b", 0L), ("b", "a", 1L)), iters = 1)
    }
    assert(neg.getMessage.contains("positive"))
    // a weight AT the bound with maximal rank concentration stays exact
    LinkRank.pageRank(edges(("a", "b", LinkRank.MaxWeight), ("b", "a", 1L)), iters = 2).collect()
  }

  test("dangling nodes drain damped mass (the documented sink convention)") {
    // b has no out-edges: its damped mass leaves the system each iteration
    val g = edges(("a", "b", 1L))
    val r = LinkRank.pageRank(g, iters = 3).select("node", "rank_u").as[(String, Long)].collect().toMap
    assert(r.keySet == Set("a", "b"))
    // mass NOT conserved — strictly below UNIT by more than the floor leak…
    assert(r.values.sum < LinkRank.UNIT - 1000)
    // …but the teleport floor keeps every node positive, and the sink
    // (receiving a's whole contribution) still outranks the source
    assert(r.values.forall(_ > 0) && r("b") > r("a"))
  }

  test("bipartite event edges are symmetric with conserved weight") {
    val ev = Seq((1L, 100L, "a"), (2L, 100L, "a"), (3L, 100L, "b"), (4L, 200L, "b"))
      .toDF("event_id", "ts", "event_type")
      .withColumn("user_id", col("ts") / 100)
      .select(col("event_id"), col("user_id").cast("long"), col("event_type"))
    val e = LinkRank.eventBipartiteEdges(ev).as[(String, String, Long)].collect()
    assert(e.length == 6) // 3 distinct (user, type) pairs, both directions
    assert(e.map(_._3).sum == 8L) // 4 events counted once per direction
    val fwd = e.filter(_._1.startsWith("u:")).map(t => (t._1, t._2, t._3)).toSet
    val rev = e.filter(_._1.startsWith("t:")).map(t => (t._2, t._1, t._3)).toSet
    assert(fwd == rev)
  }

  test("pageRank early-stop at zero L1 delta == full run (integer fixed point)") {
    // symmetric two-node graph reaches its fixed point at iteration 1:
    // r1 = teleport + 85%*(UNIT/2) = UNIT/2 = r0, so delta goes 0 there
    val g = edges(("a", "b", 1L), ("b", "a", 1L))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("node", "rank_u", "delta_u").as[(String, Long, Long)].collect().sorted.toSeq
    val full = canon(LinkRank.pageRank(g, iters = 16, checkpointEvery = 1))
    val stopped = canon(LinkRank.pageRank(g, iters = 16, checkpointEvery = 1,
      earlyStopDeltaU = 0L))
    assert(stopped == full)
    assert(stopped.forall(_._3 == 0L), "at the fixed point every delta is zero")
  }

  test("labelPropagate early-stop at zero flips == full run; flip_u observable") {
    val clique = (ns: Seq[Long]) => for (a <- ns; b <- ns if a < b) yield (a, b, 5L)
    val es = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) :+ ((3L, 10L, 1L)))
      .toDF("u", "v", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("node", "lbl", "flip_u").as[(Long, Long, Long)].collect().sorted.toSeq
    val full = canon(LinkRank.labelPropagate(es, rounds = 8, checkpointEvery = 1))
    val stopped = canon(LinkRank.labelPropagate(es, rounds = 8, checkpointEvery = 1,
      earlyStopFlips = 0L))
    assert(stopped == full)
    assert(stopped.forall(_._3 == 0L), "a converged round flips nothing")
    // flip_u is a real observable: round 1 on this graph DOES flip labels
    val r1 = LinkRank.labelPropagate(es, rounds = 1)
    assert(r1.agg(sum("flip_u")).head.getLong(0) > 0L)
  }

  test("khopDistances early-stop at an empty frontier == full run") {
    // component diameter 2 from the seed; a second component stays
    // unreachable — earlyStop must cut after round 3 with identical output
    val es = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap
    val full = canon(LinkRank.khopDistances(es, seeds, maxHops = 16, checkpointEvery = 1))
    val stopped = canon(LinkRank.khopDistances(es, seeds, maxHops = 16,
      checkpointEvery = 1, earlyStop = true))
    assert(stopped == full)
    assert(stopped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  private def lp(edges: Seq[(Long, Long, Long)], rounds: Int): Map[Long, Long] =
    LinkRank.labelPropagate(edges.toDF("u", "v", "w"), rounds)
      .select("node", "lbl").as[(Long, Long)].collect().toMap

  test("label propagation separates two cliques joined by a weak bridge") {
    // clique {1,2,3} and clique {10,11,12} (weight 5 inside), one weight-1
    // bridge 3-10: after 3 rounds each clique converges to its min label
    val clique = (ns: Seq[Long]) =>
      for (a <- ns; b <- ns if a < b) yield (a, b, 5L)
    val g = lp(clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) :+ ((3L, 10L, 1L)), 3)
    assert(Seq(1L, 2L, 3L).map(g).toSet == Set(1L))
    assert(Seq(10L, 11L, 12L).map(g).toSet == Set(10L))
  }

  test("label propagation tie votes go to the smallest label") {
    // node 5 hears equal-weight round-1 votes from 1 and 2 (each still
    // carrying its own label): smallest label wins
    val g = lp(Seq((1L, 5L, 3L), (2L, 5L, 3L)), 1)
    assert(g(5L) == 1L)
  }

  test("label propagation weighted vote beats count") {
    // node 9's single weight-10 edge to 7 outvotes two weight-1 edges to
    // {1, 2} — the weighted majority, not the neighbor count, decides
    val g = lp(Seq((7L, 9L, 10L), (1L, 9L, 1L), (2L, 9L, 1L)), 1)
    assert(g(9L) == 7L)
  }

  test("label propagation is deterministic across runs") {
    val edges = for (a <- 0L until 20L; b <- a + 1 until 20L if (a + b) % 3 == 0)
      yield (a, b, (a % 4) + 1)
    val r1 = lp(edges, 4)
    val r2 = lp(edges, 4)
    assert(r1 == r2)
  }

  test("khopDistances: level-synchronous BFS keeps the minimum hop count") {
    // path 1-2-3-4-5 plus a shortcut 1-4: node 4 is 1 hop away, not 3;
    // node 5 is 2; node 9 is disconnected and absent
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (8L, 9L))
      .toDF("u", "v")
    val seeds = Seq(1L).toDF("node")
    val d = LinkRank.khopDistances(edges, seeds, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("khopDistances: maxHops bounds the frontier; multiple seeds take the nearer") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val d1 = LinkRank.khopDistances(edges, Seq(1L).toDF("node"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(d1 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // 4,5,6 beyond 2 hops
    val d2 = LinkRank.khopDistances(edges, Seq(1L, 6L).toDF("node"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(d2(4L) == 2L && d2(5L) == 1L && d2(6L) == 0L)
  }
}
