package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting / local clustering over an undirected graph — the
  * cohesion primitive beside [[LinkRank]]'s centrality (spam/bot rings in
  * interaction graphs are triangle-dense; crawl frontiers triangle-sparse).
  *
  * Algorithm: DEGREE ORIENTATION. Orient every undirected edge from the
  * endpoint that is smaller in the total order (degree, node-id) to the
  * larger; then every triangle {a ≺ b ≺ c} is found EXACTLY ONCE as the
  * wedge a→b, a→c closed by the edge b→c. The orientation is the whole
  * scale story: out-degrees in the oriented graph are bounded by O(√m) on
  * any graph (a node keeps only edges toward HIGHER-degree endpoints), so
  * the wedge join generates O(m^1.5) candidates instead of the
  * Σ deg² = O(n·Δ²) a naive neighbor-pair join produces — the classic
  * bound (Chiba–Nishizeki; the standard distributed formulation). All
  * three steps are keyed equi-joins/aggregations: shuffle-partitioned by
  * node id, no broadcast of anything graph-sized, no driver state.
  *
  * Ordering key: `deg * 2^20 + id` packs the (degree, id) lexicographic
  * order into one comparable long — valid for node ids < 2^20 and any
  * degree < 2^43; callers with wider id domains should densify ids first.
  */
object Triangles {
  private val IdBits = 20
  private val IdCap = 1L << IdBits

  /** Per-node triangle participation over undirected `edges(u, v)`
    * (self-loops and duplicate/reversed pairs tolerated — canonicalized
    * away): returns `(node, deg, tri)` for every node, `tri` = number of
    * triangles containing it, `deg` = its undirected degree. The local
    * clustering coefficient is `tri / (deg*(deg-1)/2)` — left to the
    * caller so this output stays integer-exact.
    */
  def perNodeTriangles(edges: DataFrame): DataFrame = {
    val e0 = edges
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e0.select(col("u").as("node")).unionAll(e0.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // (degree, id) order packed into one long; fail loudly past the id cap
    val ork = deg.select(col("node"),
      when(col("node") >= IdCap || col("node") < 0L,
        raise_error(lit(s"Triangles: node ids must be in [0, $IdCap); densify first")))
        .otherwise(col("deg") * IdCap + col("node")).as("k"))
    val withK = e0
      .join(ork.withColumnRenamed("node", "u").withColumnRenamed("k", "ku"), "u")
      .join(ork.withColumnRenamed("node", "v").withColumnRenamed("k", "kv"), "v")
    val o = withK.select(
      when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("s"),
      when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("t"),
      greatest(col("ku"), col("kv")).as("kt"))
    // wedges at the order-minimal vertex, closed by the third oriented edge
    val e1 = o.select(col("s"), col("t").as("b"), col("kt").as("kb"))
    val e2 = o.select(col("s"), col("t").as("c"), col("kt").as("kc"))
    val tris = e1.join(e2, Seq("s")).filter(col("kb") < col("kc"))
      .join(o.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
      .select(col("s").as("a"), col("b"), col("c"))
    val perNode = tris.select(col("a").as("node"))
      .unionAll(tris.select(col("b").as("node")))
      .unionAll(tris.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left_outer")
      .select(col("node"), col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
  }
}
