package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    O(|queries| * |corpus|); right answer, use when queries are few.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — the scale path. The
  *    probe joins only its own bucket (equi join on `bucket`), trading
  *    recall for a 2^planes candidate reduction.
  *
  * Both are pure DataFrame programs: the distance math is codegen'd Column
  * expressions ([[graft.functions.Vectors]]), ranking is a window over the
  * query id — so the whole thing runs as scan -> (broadcast) join ->
  * window, no driver-side loops, and survives a 1000-executor scale-up.
  */
object Similarity {

  /** Final top-k ranking of a (query_id, neighbor_id, cosine) candidate
    * frame — as a map-side-combined bounded-heap AGGREGATE
    * ([[graft.functions.expressions.TopKByScore]]), not a rank window: the
    * window form shuffles and sorts EVERY candidate row per query, the
    * aggregate reduces each map partition to k rows per query before the
    * exchange. Ordering (cosine desc, neighbor_id asc) and the emitted
    * (query_id, neighbor_id, cosine, rank) schema match the window form
    * row for row.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(org.apache.spark.sql.graftnative.NativeColumns
        .topKByScore(col("cosine"), col("neighbor_id"), k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))

  /** Exact top-k by cosine. `queries` and `corpus` both need (idCol, vecCol);
    * self-matches (same id) are excluded. Ties break on candidate id.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q
      .crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** TWO-PHASE QUANTIZED top-k: an int8 approximate pass ranks candidates,
    * then the float originals re-rank exactly.
    *
    * Phase 1 scans only (id, int8 vector) — 4x less bandwidth than float32,
    * which at a 100 TB embedding column is the difference between scanning
    * 100 TB and 25 TB — and keeps `refine * k` candidates per query by
    * QUANTIZED cosine. The per-vector quantization scales cancel out of the
    * cosine, so the approximate score is simply the cosine of the int
    * arrays (integer-exact dot products inside the double accumulator).
    * Phase 2 re-joins the float vectors for the tiny candidate set
    * (|queries| * refine*k rows) and re-ranks by exact cosine.
    *
    * Both phases rank via the map-side bounded k-heap; the refine margin
    * absorbs quantization rank error (int8 cosine error is ~1e-2; only
    * near-ties can reorder, and those sit well inside `refine * k`).
    *
    * SCALE NOTE: phase 1 here is still the full |queries| x |corpus|
    * product — 4x narrower, not sub-quadratic. This form is the
    * correctness/differential baseline; the production scale path is
    * [[ivfQuantizedTopK]], which runs the same int8 phase inside IVF's
    * probed cells only.
    */
  def quantizedTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      refine: Int = 3): DataFrame = {
    require(refine >= 1, "refine must be >= 1")
    import org.apache.spark.sql.graftnative.NativeColumns
    val qq = queries.select(col(idCol).as("query_id"),
      NativeColumns.quantizeInt8(col(vecCol)).as("qz"))
    val cq = corpus.select(col(idCol).as("neighbor_id"),
      NativeColumns.quantizeInt8(col(vecCol)).as("cz"))
    val approx = qq
      .crossJoin(cq)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.cosine(col("qz"), col("cz")))
    val cand = rankTopK(approx, refine * k).select("query_id", "neighbor_id")
    val rescored = cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id")
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id")
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    rankTopK(rescored, k)
  }

  /** IVF-probed QUANTIZED top-k: [[quantizedTopK]]'s int8 scan run inside
    * [[ivfTopK]]'s probed cells — the sub-quadratic composition of the two.
    *
    * Standalone `quantizedTopK` still scans the full |queries| x |corpus|
    * product (4x narrower rows, same quadratic compute); here phase 1 only
    * scans the `nProbe / nCentroids` fraction of the corpus that shares a
    * probed cell with the query, so at 100 TB the bill is the IVF candidate
    * fraction AND each candidate row is the 4x-smaller int8 vector. Phase 2
    * re-ranks the tiny surviving candidate set with the exact float cosine,
    * exactly as in [[quantizedTopK]].
    *
    * Centroids are the deterministic first-`nCentroids` corpus rows by id,
    * COLLECTED and inlined as literal columns: the centroid set is
    * driver-small by construction (it is what [[ivfTopK]] broadcasts), and
    * as literals both cell assignments become pure projections over the
    * scan — the plan has NO BroadcastNestedLoopJoin at all, where ivfTopK's
    * broadcast-join assignment needs a PlanSpec sanction. Assignment argmax
    * = first index of the array max (ties to the lowest cell id, matching
    * `ORDER BY cosine DESC, cell_id` determinism).
    */
  def ivfQuantizedTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      nProbe: Int,
      k: Int,
      refine: Int = 3): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    require(refine >= 1, "refine must be >= 1")
    import org.apache.spark.sql.graftnative.NativeColumns
    // float -> double element cast is exact, so literal-double centroids
    // score bit-identically to the raw float rows (and to the SQL oracle's
    // per-element CAST(x AS DOUBLE))
    val cents: Array[(Long, Seq[Double])] = corpus
      .orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val cellIds = typedLit(cents.map(_._1).toSeq)
    def cellScores(vec: Column): Column =
      array(cents.map { case (_, cv) => Vectors.cosine(vec, typedLit(cv)) }: _*)

    // corpus side: ONE pass over the scan emits (id, int8 vector, cell) —
    // this narrow frame is the only thing phase 1 ever reads
    val corpusCells = corpus.select(
      col(idCol).as("neighbor_id"),
      NativeColumns.quantizeInt8(col(vecCol)).as("cz"),
      element_at(
        cellIds,
        array_position(cellScores(col(vecCol)), array_max(cellScores(col(vecCol))))
          .cast("int")).as("cell_id"))
    // query side: top-nProbe cells per probe (probes are few; the window is
    // tiny). pos is the centroid index == rank of cell_id, so ordering by
    // pos IS ordering by cell_id.
    val queryCells = {
      val w = Window.partitionBy("query_id").orderBy(col("__cs").desc, col("pos"))
      queries
        .select(
          col(idCol).as("query_id"),
          NativeColumns.quantizeInt8(col(vecCol)).as("qz"),
          posexplode(cellScores(col(vecCol))))
        .toDF("query_id", "qz", "pos", "__cs")
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= nProbe)
        .select(col("query_id"), col("qz"),
          element_at(cellIds, (col("pos") + 1).cast("int")).as("cell_id"))
    }
    // phase 1: keyed equi join on cell — each corpus row lives in exactly
    // one cell, so (query, neighbor) pairs are already distinct
    val approx = queryCells
      .join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.cosine(col("qz"), col("cz")))
    val cand = rankTopK(approx, refine * k).select("query_id", "neighbor_id")
    // phase 2: exact float re-rank of |queries| * refine*k candidate rows
    val rescored = cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id")
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id")
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    rankTopK(rescored, k)
  }

  /** Lloyd-refined IVF centroids as a short sequence of DataFrame jobs:
    * seed = first `k` corpus rows by id (deterministic), then `iters`
    * rounds of (assign every vector to its best centroid via broadcast
    * argmax) -> (new centroid = per-dimension mean, computed by
    * posexplode + groupBy(cell, dim) + re-assembly). Each round is two
    * shuffles whose size is independent of dimensionality tricks — no
    * driver-side vectors beyond the k-row centroid frame itself. Cells
    * that lose all members drop out (standard Lloyd behavior).
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
    for (_ <- 0 until iters) {
      // per-vector argmax via map-side-combined max_by: only N rows shuffle,
      // not the N * k broadcast-join blowup (see ivfTopK's corpus assignment)
      val best = corpus.select(col(idCol).as("vid"), col(vecCol).as("v"))
        .join(broadcast(centroids))
        .withColumn("__cs", Vectors.cosine(col("v"), col("centroid")))
        .groupBy("vid")
        .agg(max_by(col("cell_id"), struct(col("__cs"), -col("cell_id"))).as("cell_id"),
          first(col("v")).as("v"))
        .select(col("cell_id"), col("v"))
      // decimal-exact mean (order-independent accumulation): plain avg()
      // over doubles is partition-order-dependent, so refined centroids —
      // and therefore IVF assignments at nProbe < nCentroids — would differ
      // bit-wise between runs (repo determinism standard, SURVEY §7.4.6)
      centroids = best
        .select(col("cell_id"), posexplode(col("v")))
        .toDF("cell_id", "pos", "x")
        .groupBy("cell_id", "pos")
        .agg((graft.functions.Scalars.dsumHi(col("x")) / count(col("x"))).as("m"))
        .groupBy("cell_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell_id"), expr("transform(pm, e -> e.m)").as("centroid"))
    }
    centroids
  }

  /** IVF (inverted-file) top-k: the classic two-stage ANN.
    *
    *  1. Coarse quantize: every corpus vector is assigned to its
    *     nearest-centroid cell (centroids = the deterministic first
    *     `nCentroids` corpus rows by id, optionally Lloyd-refined with
    *     [[kmeansCentroids]] when `kmeansIters > 0`; broadcast join +
    *     map-side-combined `max_by` argmax — O(N * C) map-side work, but
    *     only N rows ever shuffle).
    *  2. Probe: each query searches only the `nProbe` cells whose centroids
    *     score highest for it — an equi join on cell id, so the candidate
    *     set is ~N * nProbe / nCentroids per query instead of N.
    *
    * With nProbe == nCentroids every cell is probed and the result equals
    * [[bruteForceTopK]] exactly (the scalatest recall check) — regardless
    * of centroid quality, which only affects recall at nProbe < nCentroids.
    * At 100 TB the centroid set stays driver-small (broadcast), assignments
    * are computed once and can be persisted as a bucketed table keyed by
    * cell.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      nProbe: Int,
      k: Int,
      kmeansIters: Int = 0): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    val centroids = broadcast(
      kmeansCentroids(corpus, idCol, vecCol, nCentroids, kmeansIters))

    def cellScored(df: DataFrame, id: String, out: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(out))
        .join(centroids)
        .withColumn("__cs", Vectors.cosine(col(out), col("centroid")))

    // Corpus assignment (keep=1) is an ARGMAX, not a ranking: max_by gets
    // map-side partial aggregation, so the broadcast-join blowup (N * C
    // scored rows) collapses back to N rows BEFORE the shuffle. The window
    // alternative ships and sorts all N * C rows — a C-times-larger
    // shuffle for the same answer. Ties break to the lowest cell_id
    // (negated id in the ordering struct), matching the window's
    // (desc cosine, asc cell_id) determinism.
    val corpusCells = cellScored(corpus, "neighbor_id", "cv")
      .groupBy("neighbor_id")
      .agg(
        max_by(col("cell_id"), struct(col("__cs"), -col("cell_id"))).as("cell_id"),
        first(col("cv")).as("cv"))
      .select(col("neighbor_id"), col("cv"), col("cell_id"))
    // Query probing keeps nProbe cells per (few) probes — the window stays,
    // partitioned by query id over a small frame.
    val queryCells = {
      val w = Window.partitionBy("query_id").orderBy(col("__cs").desc, col("cell_id"))
      cellScored(queries, "query_id", "qv")
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= nProbe)
        .select(col("query_id"), col("qv"), col("cell_id"))
    }
    val scored = queryCells
      .join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** BANDED LSH top-k: candidates are corpus vectors sharing ANY of the
    * probe's `bands` band buckets (`planesPerBand` sign bits each — the
    * OR-of-ANDs construction, see [[graft.operators.Dedup.embeddingNearDup]]
    * for the scale rationale), deduped per (query, neighbor) pair on ids
    * only, then exactly cosine-ranked. A single-table LSH is the degenerate
    * bands=1 case.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bands: Int,
      planesPerBand: Int,
      k: Int,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(
        col(id),
        posexplode(Vectors.bandedBuckets(col(vec), bands, planesPerBand)))
        .toDF(id, "band", "bucket")
    // cap applies to the CORPUS side only: an over-full corpus bucket is the
    // O(size^2) risk; probes are few and must keep all their bands
    val candidates = bucketed(q, "query_id", "qv")
      .join(Dedup.capBuckets(bucketed(c, "neighbor_id", "cv"), maxBucket),
        Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = candidates
      .join(q, "query_id")
      .join(c, "neighbor_id")
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }
}
