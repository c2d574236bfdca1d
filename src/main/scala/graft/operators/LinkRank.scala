package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over an edge list — the link-analysis primitive of
  * web-crawl curation (Common-Crawl-style pipelines rank hosts/URLs by
  * centrality to prioritize crawl frontier and to score page quality for
  * training-data selection; Page et al. 1999, Brin & Page 1998).
  *
  * ALL rank arithmetic is integer, in fixed units of 1e-12 of total rank
  * mass, with floor division at every step — deliberately: iterated
  * floating-point accumulation is order-sensitive, and a hash aggregation
  * visits rows in nondeterministic order, so a double-valued PageRank can
  * differ bit-wise run to run AND engine to engine. Integer units make
  * every iteration exactly reproducible (the DuckDB oracle unrolls the
  * same iterations and must match to the unit), at a precision (1e-12)
  * far below any ranking decision. The floor-div mass leak per step is
  * bounded by (#edges + #nodes) units — likewise decision-irrelevant.
  *
  * Scale shape (the 100 TB web-graph posture):
  *  - the edge list with its out-weight denominators (`edgesW`) is built
  *    ONCE and persisted pre-partitioned by `src` — each of the `iters`
  *    rank joins then reuses that partitioning (one exchange per
  *    iteration for the `dst` re-aggregation, none for the join side);
  *  - per-iteration state is one (node, rank) row per node — the small
  *    side; the damping/teleport constants are literals;
  *  - a fixed low iteration count is the production norm for
  *    crawl-quality ranks (a handful of iterations separates head from
  *    tail; full convergence buys nothing for selection). For deep
  *    iteration the same adaptive-materialization discipline as
  *    [[Dedup.resolveClusters]] applies: checkpoint the rank frame every
  *    few rounds so the lineage stays flat.
  */
object LinkRank {

  /** One unit = 1e-12 of total rank mass. */
  val UNIT = 1000000000000L

  /** Largest admissible edge weight: a per-edge contribution is
    * `rank_u * w` before the floor divide, rank_u is bounded by UNIT
    * (total mass never exceeds it), so `w <= MaxWeight` keeps the product
    * under 2^62 with a 4x margin — validated up front because a silent
    * Long wrap under non-ANSI Spark would corrupt ranks, not crash.
    * Weights are relative; rescale (e.g. cap or log-bucket) upstream.
    */
  val MaxWeight = 2000000L

  /** Iterate weighted PageRank on `edges(src, dst, w)` (long weights in
    * (0, [[MaxWeight]]], validated). Damping is the rational
    * `dampNum/dampDen` (default 85/100) so both engines compute the
    * identical integer expression. Returns (node, rank_u, delta_u) —
    * rank in units plus the node's last-iteration absolute rank change,
    * so convergence is observable (`sum(delta_u)` is the L1 step norm;
    * LinkRankSpec tracks it shrinking across iteration counts).
    *
    * MASS ACCOUNTING: rank sums to ~UNIT minus the floor-div leak ONLY
    * when every node has at least one outgoing edge (true for the
    * bipartite fixture). A DANGLING node (dst-only) re-emits nothing: its
    * damped mass leaves the system each iteration — the "rank sink drain"
    * convention, which RELATIVE ranking tolerates (all ranks shrink
    * together and the teleport floor keeps every node positive).
    * Mass-conserving dangling redistribution would need a per-iteration
    * driver scalar (the dangling sum) folded into the teleport literal —
    * a deliberate non-feature here; at the fixed low iteration counts
    * this operator targets, drain and redistribution order ranks
    * near-identically.
    *
    * Materialization: the rank frame is localCheckpoint'ed every
    * `checkpointEvery` iterations AND at the end (the
    * [[Dedup.resolveClusters]] flat-lineage discipline), so the returned
    * frame's plan is bounded and `edgesW` can be unpersisted before
    * returning — no block-manager storage outlives the call.
    *
    * EARLY STOP: with `earlyStopDeltaU >= 0`, the L1 step norm
    * `sum(delta_u)` is checked at each checkpoint boundary (the frame is
    * materialized there anyway — the check is one cheap aggregate over
    * ≤|V| rows, no extra materialization) and iteration stops once it is
    * ≤ the bound. At a 100 TB graph this is the difference between
    * burning fixed iterations and stopping the moment the ranking is
    * stable — and the observable that ALARMS when it is not shrinking.
    * `earlyStopDeltaU = 0` is exact: integer rank is a deterministic
    * fixed-point map, so a zero-delta frame reproduces itself and the
    * early-stopped result equals the full run's (LinkRankSpec proves it);
    * positive bounds trade iterations for tolerance.
    */
  def pageRank(edges: DataFrame, iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
      checkpointEvery: Int = 4, earlyStopDeltaU: Long = -1L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters $iters out of [1,16] — see the deep-iteration note")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val spark = edges.sparkSession
    val wb = edges.agg(min("w"), max("w")).head
    if (!wb.isNullAt(0)) {
      require(wb.getLong(0) > 0, s"edge weights must be positive (got ${wb.getLong(0)})")
      require(wb.getLong(1) <= MaxWeight,
        s"edge weight ${wb.getLong(1)} exceeds MaxWeight $MaxWeight — rank_u * w would " +
          "overflow Long silently under non-ANSI Spark; rescale weights upstream")
    }
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()
    // out-weight denominator per source, attached once; the per-iteration
    // join key is src, so partition by it here and every iteration reuses
    // the exchange
    val edgesW = edges
      .join(edges.groupBy("src").agg(sum("w").as("wout")), "src")
      .repartition(col("src"))
      .persist()
    val n = nodes.count() // driver scalar: the node count parameterizes the teleport literal
    if (n == 0) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          edges.schema("src").dataType),
        org.apache.spark.sql.types.StructField("rank_u",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("delta_u",
          org.apache.spark.sql.types.LongType))))
    val teleport = ((dampDen - dampNum) * UNIT) / (dampDen * n)
    var ranks = nodes.withColumn("rank_u", lit(UNIT / n))
    var i = 1
    var converged = false
    while (i <= iters && !converged) {
      // per-edge contribution floor((r*w)/W), then exact integer sum —
      // every term and the total are order-independent
      // `div` (integral division), NOT `/`: rank_u * w approaches 1e18,
      // far past a double's 2^53 exact-integer ceiling — a float divide
      // here would silently corrupt low-order units
      val contrib = edgesW.join(
          ranks.select(col("node").as("src"), col("rank_u")), "src")
        .select(col("dst").as("node"), expr("(rank_u * w) div wout").as("c"))
        .groupBy("node").agg(sum("c").as("cin"))
      // the prior rank frame carries the full node universe, so joining
      // contrib back onto IT (not `nodes`) both updates and diffs in one
      // pass
      ranks = ranks.select(col("node"), col("rank_u").as("__prev"))
        .join(contrib, Seq("node"), "left")
        .withColumn("rank_u",
          lit(teleport) + expr(s"($dampNum * coalesce(cin, 0L)) div $dampDen"))
        .select(col("node"), col("rank_u"),
          abs(col("rank_u") - col("__prev")).as("delta_u"))
      val boundary = i % checkpointEvery == 0 || i == iters
      if (boundary) ranks = ranks.localCheckpoint()
      if (boundary && earlyStopDeltaU >= 0L && i < iters) {
        val l1 = ranks.agg(sum("delta_u")).head()
        converged = !l1.isNullAt(0) && l1.getLong(0) <= earlyStopDeltaU
      }
      i += 1
    }
    edgesW.unpersist() // final frame is checkpointed — nothing references the cache
    ranks
  }

  /** Synchronous weighted LABEL PROPAGATION (Raghavan et al. 2007) over an
    * undirected edge list `(u, v, w)` — the community-detection sibling of
    * [[Dedup.connectedComponents]]: where CC answers "reachable at all",
    * LPA's neighbor-majority vote splits a connected graph into densely
    * linked communities, the granularity crawl/dedup curation actually
    * wants (a CC of the whole web is one component; its communities are
    * sites/topics).
    *
    * Determinism (the classic LPA pitfall — random visit order — removed):
    * SYNCHRONOUS rounds (every node updates from the previous round's
    * labels simultaneously), label_0(x) = x, and
    * `label_r(x) = argmax_L Σ w(x,y)·[label_{r-1}(y) = L]` with ties to
    * the SMALLEST label. Integer weights, exact integer vote sums, total
    * tie order ⇒ bit-identical on every engine; the DuckDB oracle unrolls
    * the same rounds. (Synchronous LPA can two-color-oscillate on
    * bipartite structures — a fixed small `rounds` is the standard remedy
    * and the production norm, same as [[pageRank]]'s fixed iteration
    * count.)
    *
    * Scale shape: the symmetrized edge list is built once, persisted
    * pre-partitioned by the VOTING neighbor (the per-round join key), so
    * each round is one broadcast-free keyed join + one (node, label) vote
    * aggregation + one per-node argmax — the argmax is a
    * `max(struct(votes, -label))` map-side-combining aggregate, never a
    * sort. Per-round state is one (node, label) row per node. Lineage is
    * kept flat with the [[pageRank]] localCheckpoint discipline.
    *
    * Node ids must be numeric (the `-label` tie trick); labels ARE node
    * ids throughout, so the output `(node, lbl, flip_u)` is directly a
    * community assignment plus the convergence observable: `flip_u` is 1
    * iff the node's label changed in the LAST round (`sum(flip_u)` is the
    * round's flip count — zero means a fixed point). With
    * `earlyStopFlips >= 0`, the flip count is checked at checkpoint
    * boundaries (where the frame is materialized anyway) and rounds stop
    * once ≤ the bound — `earlyStopFlips = 0` is exact, since synchronous
    * LPA is a deterministic map and a zero-flip frame reproduces itself
    * (LinkRankSpec proves early-stop == full run).
    */
  def labelPropagate(edges: DataFrame, rounds: Int, checkpointEvery: Int = 4,
      earlyStopFlips: Long = -1L): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds $rounds out of [1,16]")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val sym = edges.select(col("u"), col("v"), col("w"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v"), col("w")))
      .repartition(col("v")) // v = the voting neighbor = the per-round join key
      .persist()
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node").cast("long"))
      .withColumn("flip_u", lit(0L))
    var r = 1
    var converged = false
    while (r <= rounds && !converged) {
      val voted = sym
        .join(labels.select(col("node").as("v"), col("lbl")), "v")
        .groupBy(col("u").as("node"), col("lbl"))
        .agg(sum("w").as("__votes"))
        .groupBy("node")
        .agg(max(struct(col("__votes"), (-col("lbl")).as("__nl"))).as("__w"))
        .select(col("node"), (-col("__w.__nl")).as("lbl"))
      // flip detection joins the new labels back onto the previous round's
      // — both sides are node-keyed aggregates, so the exchange is reused
      labels = voted
        .join(labels.select(col("node"), col("lbl").as("__prev")), "node")
        .select(col("node"), col("lbl"),
          (col("lbl") =!= col("__prev")).cast("long").as("flip_u"))
      val boundary = r % checkpointEvery == 0 || r == rounds
      if (boundary) labels = labels.localCheckpoint()
      if (boundary && earlyStopFlips >= 0L && r < rounds) {
        val flips = labels.agg(sum("flip_u")).head()
        converged = !flips.isNullAt(0) && flips.getLong(0) <= earlyStopFlips
      }
      r += 1
    }
    sym.unpersist()
    labels
  }

  /** K-HOP BFS distances from a seed set over an undirected edge list
    * `(u, v)` — the reachability primitive next to [[labelPropagate]]'s
    * communities and [[Dedup.connectedComponents]]'s components: "what is
    * within k hops of these nodes" (contamination neighborhoods around
    * known-bad hosts, expansion candidates around curated seeds).
    *
    * Level-synchronous BFS, `maxHops` rounds: each round expands the
    * current distance frame across one edge hop and keeps the per-node
    * MINIMUM distance — pure integer arithmetic with an order-free min,
    * so results are deterministic and the oracle unrolls the same rounds.
    * Output `(node, dist)`, reachable nodes only (seeds at 0).
    *
    * Scale shape: the symmetrized edge list is persisted pre-partitioned
    * by the expansion key, each round is one keyed join + one min
    * aggregation over a frame bounded by the reachable set, and lineage
    * stays flat under the [[pageRank]] localCheckpoint discipline. For
    * web-graph diameters the fixed small `maxHops` is the point — k-hop
    * neighborhoods, not all-pairs shortest paths.
    */
  def khopDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      checkpointEvery: Int = 4, earlyStop: Boolean = false): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16, s"maxHops $maxHops out of [1,16]")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .persist()
    var dist = seeds.select(col("node")).distinct().withColumn("dist", lit(0L))
    var h = 1
    var converged = false
    while (h <= maxHops && !converged) {
      val expanded = sym
        .join(dist.select(col("node").as("u"), col("dist")), "u")
        .select(col("v").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.unionByName(expanded)
        .groupBy("node").agg(min("dist").as("dist"))
      val boundary = h % checkpointEvery == 0 || h == maxHops
      if (boundary) dist = dist.localCheckpoint()
      // EXACT early stop ([[pageRank]]'s convergence-observable family):
      // level-synchronous BFS assigns each node its FIRST-reach hop as
      // its final distance, so an empty level-h frontier means every
      // later round is a fixed point — checked only at checkpoint
      // boundaries, where the frame is materialized anyway
      if (boundary && earlyStop && h < maxHops)
        converged = dist.filter(col("dist") === h).limit(1).isEmpty
      h += 1
    }
    sym.unpersist()
    dist
  }

  /** The bipartite interaction graph of the events table: user u touching
    * event type t with multiplicity c contributes edges u→t and t→u of
    * weight c — rank then measures behavioral centrality on both sides
    * (the in-fixture stand-in for a host/page link graph). Node ids are
    * prefixed strings so the two partitions cannot collide.
    */
  def eventBipartiteEdges(events: DataFrame): DataFrame = {
    val pairs = events.groupBy("user_id", "event_type").agg(count(lit(1)).as("w"))
    pairs.select(concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("t:"), col("event_type")).as("dst"), col("w"))
      .unionByName(pairs.select(concat(lit("t:"), col("event_type")).as("src"),
        concat(lit("u:"), col("user_id")).as("dst"), col("w")))
  }
}
