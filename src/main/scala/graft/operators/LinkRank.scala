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

  /** Iterate weighted PageRank on `edges(src, dst, w)` (long weights > 0).
    * Damping is the rational `dampNum/dampDen` (default 85/100) so both
    * engines compute the identical integer expression. Returns
    * (node, rank_u) — rank in units, summing to ~UNIT (minus documented
    * floor leak). Nodes = every endpoint observed in `edges`.
    */
  def pageRank(edges: DataFrame, iters: Int, dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters $iters out of [1,16] — see the deep-iteration note")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")
    val spark = edges.sparkSession
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
          org.apache.spark.sql.types.LongType))))
    val teleport = ((dampDen - dampNum) * UNIT) / (dampDen * n)
    var ranks = nodes.withColumn("rank_u", lit(UNIT / n))
    for (_ <- 1 to iters) {
      // per-edge contribution floor((r*w)/W), then exact integer sum —
      // every term and the total are order-independent
      // `div` (integral division), NOT `/`: rank_u * w approaches 1e18,
      // far past a double's 2^53 exact-integer ceiling — a float divide
      // here would silently corrupt low-order units
      val contrib = edgesW.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("(rank_u * w) div wout").as("c"))
        .groupBy("node").agg(sum("c").as("cin"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(cin, 0L)) div $dampDen")).as("rank_u"))
    }
    ranks
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
