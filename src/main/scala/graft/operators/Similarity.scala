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

  /** Driver-collected centroid LITERALS: a (cell_id, centroid) frame —
    * driver-small by construction everywhere it appears; it is exactly what
    * a broadcast would ship — collected, sorted by cell_id, and inlined as
    * plan literals. Cell scoring, argmax assignment, and probing all become
    * pure PROJECTIONS over the scan; the broadcast-join alternative
    * (`join(broadcast(centroids))` with no key) is a real
    * BroadcastNestedLoopJoin that needs a PlanSpec sanction, and its argmax
    * needs a groupBy — an extra N-row shuffle the projection form never pays.
    *
    * float -> double element cast is exact, so literal-double centroids
    * score bit-identically to the raw float rows (and to the SQL oracle's
    * per-element CAST(x AS DOUBLE)).
    */
  private[graft] final case class CentroidLits(cells: Array[(Long, Seq[Double])]) {
    /** Cell ids as an array literal, ascending. */
    val cellIds: Column = typedLit(cells.map(_._1).toSeq)

    /** Array of cosine(vec, centroid_i) in cell_id order. Zero centroids
      * (an empty corpus seeding Lloyd) must stay TYPED — a bare `array()`
      * is NullType and fails analysis inside array_position/array_max, so
      * empty-input totality (EmptyInputSpec) depends on the cast.
      */
    def scores(vec: Column): Column =
      if (cells.isEmpty) array().cast("array<double>")
      else array(cells.map { case (_, cv) => Vectors.cosine(vec, typedLit(cv)) }: _*)

    /** Argmax cell id; ties go to the LOWEST cell_id (first array position
      * of the max over the id-sorted score array) — the same determinism
      * rule as `max_by(cell_id, struct(cos, -cell_id))` and the oracles'
      * `ORDER BY cos DESC, cell_id`.
      *
      * The `coalesce(-1)` is semantically a no-op (array_max's value is an
      * element of the array, so array_position is always >= 1 and the
      * element_at always hits) but makes the column PROVABLY NON-NULL —
      * without it, non-ANSI sessions treat element_at as nullable and the
      * join-key null-safety rewrite re-evaluates this ENTIRE literal
      * centroid tree in an injected isnotnull Filter AND in the pushed
      * DataFilter at the scan (measured: 8x on the probed-cell join,
      * interpreted eval with no subexpression sharing in Filters).
      */
    def assign(vec: Column): Column =
      coalesce(
        element_at(cellIds,
          array_position(scores(vec), array_max(scores(vec))).cast("int")),
        lit(-1L))

    /** Argmax as the 1-based POSITION in cell_id order (the PQ code form:
      * a centroid's index, not its id) — same tie rule as [[assign]]
      * (first position of the max == lowest cell_id).
      */
    def assignPos(vec: Column): Column =
      array_position(scores(vec), array_max(scores(vec))).cast("int")

    /** Array of dot(vec, centroid_i) in cell_id order — the per-query ADC
      * lookup table of [[graft.operators.Similarity.pqTopK]]. Typed when
      * empty, as [[scores]].
      */
    def dots(vec: Column): Column =
      if (cells.isEmpty) array().cast("array<double>")
      else array(cells.map { case (_, cv) => Vectors.dot(vec, typedLit(cv)) }: _*)
  }

  private[graft] def collectCentroids(centroids: DataFrame): CentroidLits =
    CentroidLits(centroids
      .select(col("cell_id").cast("long"), col("centroid").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1))

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
    *
    * QUERY-SIDE CONTRACT (applies to every `*TopK` here): `queries` is the
    * PROBE set — a driver-manageable batch (a user request, an eval set),
    * orders of magnitude smaller than `corpus`. The phase-2 candidate
    * frame (`|queries| * refine * k` rows, each carrying one float vector)
    * is broadcast EXPLICITLY on that assumption; a corpus-as-queries call
    * would force that whole product through a driver broadcast and OOM
    * rather than degrade. For all-pairs/self-join shapes use the dedup
    * family ([[graft.operators.Dedup.embeddingNearDup]] /
    * [[graft.operators.Dedup.semanticDedup]]), whose blocking is built
    * for corpus x corpus.
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
    // phase-2 build side is ALWAYS the candidates: <= |queries|*refine*k
    // rows by construction. Left implicit the planner errs in both
    // directions — a sub-broadcast-threshold corpus becomes the build side
    // (measured: k<=16 scale probes broadcast the whole corpus and ran 6x
    // slower than k=64, where the corpus outgrew the threshold), and at
    // real scale the post-window cand carries no stats, risking a
    // full-corpus sort-merge shuffle.
    val rescored = broadcast(cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id"))
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
    * Centroids are the deterministic first-`nCentroids` corpus rows by id
    * (Lloyd-refined by [[kmeansCentroids]] when `kmeansIters > 0`),
    * COLLECTED and inlined as [[CentroidLits]] literal columns, so both
    * cell assignments are pure projections over the scan — the plan has NO
    * BroadcastNestedLoopJoin at all. Assignment argmax ties to the lowest
    * cell id, matching `ORDER BY cosine DESC, cell_id` determinism.
    */
  def ivfQuantizedTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      nProbe: Int,
      k: Int,
      refine: Int = 3,
      kmeansIters: Int = 0): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    require(refine >= 1, "refine must be >= 1")
    import org.apache.spark.sql.graftnative.NativeColumns
    val cents = collectCentroids(
      kmeansCentroids(corpus, idCol, vecCol, nCentroids, kmeansIters))

    // corpus side: ONE pass over the scan emits (id, int8 vector, cell) —
    // this narrow frame is the only thing phase 1 ever reads
    val corpusCells = corpus.select(
      col(idCol).as("neighbor_id"),
      NativeColumns.quantizeInt8(col(vecCol)).as("cz"),
      cents.assign(col(vecCol)).as("cell_id"))
    // query side: top-nProbe cells per probe (probes are few; the window is
    // tiny). pos is the centroid index == rank of cell_id, so ordering by
    // pos IS ordering by cell_id.
    val queryCells = {
      val w = Window.partitionBy("query_id").orderBy(col("__cs").desc, col("pos"))
      queries
        .select(
          col(idCol).as("query_id"),
          NativeColumns.quantizeInt8(col(vecCol)).as("qz"),
          posexplode(cents.scores(col(vecCol))))
        .toDF("query_id", "qz", "pos", "__cs")
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= nProbe)
        .select(col("query_id"), col("qz"),
          element_at(cents.cellIds, (col("pos") + 1).cast("int")).as("cell_id"))
    }
    // phase 1: keyed equi join on cell — each corpus row lives in exactly
    // one cell, so (query, neighbor) pairs are already distinct
    // probe side is <= |queries| * nProbe rows — always the build side
    // (same mis-broadcast hazard as the phase-2 note below)
    val approx = broadcast(queryCells)
      .join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.cosine(col("qz"), col("cz")))
    val cand = rankTopK(approx, refine * k).select("query_id", "neighbor_id")
    // phase 2: exact float re-rank of |queries| * refine*k candidate rows
    // phase-2 build side is ALWAYS the candidates: <= |queries|*refine*k
    // rows by construction. Left implicit the planner errs in both
    // directions — a sub-broadcast-threshold corpus becomes the build side
    // (measured: k<=16 scale probes broadcast the whole corpus and ran 6x
    // slower than k=64, where the corpus outgrew the threshold), and at
    // real scale the post-window cand carries no stats, risking a
    // full-corpus sort-merge shuffle.
    val rescored = broadcast(cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id")
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    rankTopK(rescored, k)
  }

  /** Lloyd-refined IVF centroids as a short sequence of DataFrame jobs:
    * seed = first `k` corpus rows by id (deterministic), then `iters`
    * rounds of (assign every vector to its best centroid — a pure
    * PROJECTION via [[CentroidLits]] argmax, zero shuffle) -> (new
    * centroid = per-dimension mean, posexplode + groupBy(cell, dim) +
    * re-assembly: ONE shuffle per round). No driver-side state beyond the
    * k-row centroid literals themselves. Cells that lose all members drop
    * out (standard Lloyd behavior).
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
    // Lloyd's rescans the corpus every iteration — cache the ONE projection
    // the loop reads (just the vector column) so iters x I/O collapses to a
    // single scan + cache hits (MEMORY_AND_DISK: a corpus bigger than
    // executor memory degrades to a local-disk re-read, still never a
    // second source scan). The per-iteration centroid literals keep the
    // lineage flat, so the cache is the only thing carrying state.
    val vecs = corpus.select(col(vecCol).as("__v"))
    if (iters > 0) vecs.persist()
    for (_ <- 0 until iters) {
      // per-vector argmax as a literal-centroid projection: no join, no
      // groupBy — the N x k scoring happens map-side inside the scan and
      // only the (cell, v) rows the mean below needs ever exist
      val cents = collectCentroids(centroids)
      val best = vecs.select(
        cents.assign(col("__v")).as("cell_id"), col("__v").as("v"))
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
    if (iters > 0) {
      // the last iteration's centroids still reference the cache lazily —
      // materialize them (k rows) before releasing it
      centroids = centroids.localCheckpoint()
      vecs.unpersist()
    }
    centroids
  }

  /** IVF (inverted-file) top-k: the classic two-stage ANN.
    *
    *  1. Coarse quantize: every corpus vector is assigned to its
    *     nearest-centroid cell (centroids = the deterministic first
    *     `nCentroids` corpus rows by id, optionally Lloyd-refined with
    *     [[kmeansCentroids]] when `kmeansIters > 0`; inlined as
    *     [[CentroidLits]] literals so the argmax is a pure projection —
    *     O(N * C) map-side work, ZERO shuffle, no join in the plan).
    *  2. Probe: each query searches only the `nProbe` cells whose centroids
    *     score highest for it — an equi join on cell id, so the candidate
    *     set is ~N * nProbe / nCentroids per query instead of N.
    *
    * With nProbe == nCentroids every cell is probed and the result equals
    * [[bruteForceTopK]] exactly (the scalatest recall check) — regardless
    * of centroid quality, which only affects recall at nProbe < nCentroids.
    * At 100 TB the centroid set stays driver-small by construction,
    * assignments are computed once and can be persisted as a bucketed
    * table keyed by cell ([[ivfWriteIndex]]). The probe frame
    * (`|queries| * nProbe` rows) is broadcast under [[quantizedTopK]]'s
    * QUERY-SIDE CONTRACT — queries are a small probe batch, never the
    * corpus itself.
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
    val cents = collectCentroids(
      kmeansCentroids(corpus, idCol, vecCol, nCentroids, kmeansIters))
    val corpusCells = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      cents.assign(col(vecCol)).as("cell_id"))
    // Query probing keeps nProbe cells per (few) probes — a tiny window;
    // pos is the centroid index == rank of cell_id, so ordering by pos IS
    // the (desc cosine, asc cell_id) determinism rule.
    val queryCells = {
      val w = Window.partitionBy("query_id").orderBy(col("__cs").desc, col("pos"))
      queries
        .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
          posexplode(cents.scores(col(vecCol))))
        .toDF("query_id", "qv", "pos", "__cs")
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= nProbe)
        .select(col("query_id"), col("qv"),
          element_at(cents.cellIds, (col("pos") + 1).cast("int")).as("cell_id"))
    }
    // probe side is <= |queries| * nProbe rows — always the build side
    // (same mis-broadcast hazard as the quantized form's phase-2 note)
    val scored = broadcast(queryCells)
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
    val candidates = broadcast(bucketed(q, "query_id", "qv"))
      .join(Dedup.capBuckets(bucketed(c, "neighbor_id", "cv"), maxBucket),
        Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = broadcast(candidates.join(q, "query_id"))
      .join(c, "neighbor_id")
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** Per-subspace PQ codebooks: split the `dim`-dimensional space into `m`
    * contiguous `dim/m`-wide subspaces and train `ksub` codewords in each
    * with the SAME deterministic [[kmeansCentroids]] recipe (seed = first
    * `ksub` corpus rows' subvectors, optional Lloyd refinement) — spherical
    * quantization per subspace, matching the cosine/dot metric of the rest
    * of the ANN family. Returned in subspace order; each codebook is
    * driver-small ([[CentroidLits]]) by construction.
    */
  private[graft] def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      kmeansIters: Int): IndexedSeq[CentroidLits] = {
    require(m >= 1 && dim % m == 0, s"m must divide dim ($dim % $m != 0)")
    require(ksub >= 1, "ksub must be >= 1")
    val subDim = dim / m
    (0 until m).map { j =>
      val sub = corpus.select(col(idCol),
        slice(col(vecCol), j * subDim + 1, subDim).as(vecCol))
      collectCentroids(kmeansCentroids(sub, idCol, vecCol, ksub, kmeansIters))
    }
  }

  /** PRODUCT-QUANTIZATION encoding (Jégou et al. 2011): each vector
    * compresses to `m` small integers — the 1-based index of its nearest
    * codeword per subspace (nearest by subspace cosine, argmax ties to the
    * lowest codeword index). Output: (id, codes array<int>).
    *
    * THIS is the ANN memory story at 100 TB: a 64-dim float32 embedding is
    * 256 bytes; its m=4 x ksub<=256 PQ code is 4 BYTES — the whole corpus
    * index fits where 1/64th of the raw vectors would, and candidate
    * scoring ([[pqTopK]]'s ADC) reads only codes. The encode itself is a
    * pure literal-codebook PROJECTION over the scan (the [[CentroidLits]]
    * shape: no join, no shuffle), one pass, written once as the
    * index-at-rest.
    */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      kmeansIters: Int = 0): DataFrame = {
    val books = pqCodebooks(corpus, idCol, vecCol, dim, m, ksub, kmeansIters)
    val subDim = dim / m
    corpus.select(col(idCol).as("vec_id"),
      array((0 until m).map { j =>
        books(j).assignPos(slice(col(vecCol), j * subDim + 1, subDim))
      }: _*).as("codes"))
  }

  /** PQ top-k with ASYMMETRIC DISTANCE COMPUTATION: corpus vectors are
    * scored against a query through their PQ codes only — approx
    * dot(q, x) = sum_j dot(q_j, codeword_j(x)) — then the top
    * `refine * k` candidates re-rank by exact float cosine (the
    * [[quantizedTopK]] two-phase shape; the refine margin absorbs both
    * quantization error and the dot-vs-cosine metric gap, which vanishes
    * on normalized embeddings).
    *
    * Per query the `m` codeword dot-product tables (m x ksub doubles)
    * are computed ONCE as literal-codebook projections; candidate scoring
    * is then `m` array lookups + a fixed left-associated sum per pair —
    * no float vector is touched until the re-rank. Phase 1 reads
    * (id, codes): ~dim/m x 4-byte-int compression of the scan relative
    * to [[quantizedTopK]]'s int8 pass, with the same quadratic pairing —
    * this form is the correctness baseline; at scale the identical ADC
    * scoring runs inside IVF's probed cells (compose as
    * [[ivfQuantizedTopK]] does with int8).
    */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      k: Int,
      refine: Int = 3,
      kmeansIters: Int = 0): DataFrame = {
    require(refine >= 1, "refine must be >= 1")
    val books = pqCodebooks(corpus, idCol, vecCol, dim, m, ksub, kmeansIters)
    val subDim = dim / m
    val enc = corpus.select(col(idCol).as("neighbor_id") +:
      (0 until m).map { j =>
        books(j).assignPos(slice(col(vecCol), j * subDim + 1, subDim)).as(s"__c$j")
      }: _*)
    val luts = queries.select(col(idCol).as("query_id") +:
      (0 until m).map { j =>
        books(j).dots(slice(col(vecCol), j * subDim + 1, subDim)).as(s"__l$j")
      }: _*)
    val approx = luts
      .crossJoin(enc)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        (0 until m).map(j => element_at(col(s"__l$j"), col(s"__c$j"))).reduce(_ + _))
    val cand = rankTopK(approx, refine * k).select("query_id", "neighbor_id")
    // phase-2 build side is ALWAYS the candidates: <= |queries|*refine*k
    // rows by construction. Left implicit the planner errs in both
    // directions — a sub-broadcast-threshold corpus becomes the build side
    // (measured: k<=16 scale probes broadcast the whole corpus and ran 6x
    // slower than k=64, where the corpus outgrew the threshold), and at
    // real scale the post-window cand carries no stats, risking a
    // full-corpus sort-merge shuffle.
    val rescored = broadcast(cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id")
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    rankTopK(rescored, k)
  }

  /** IVF + PQ: the production ANN composition at 100 TB (the FAISS
    * IVFPQ shape) — coarse quantization bounds WHICH rows a query
    * scores ([[ivfTopK]]'s probed cells, an equi join), product
    * quantization bounds WHAT phase 1 reads per row (the m-int code,
    * not the vector). The index-at-rest is (id, cell_id, codes):
    * ~8 bytes a row where the raw float row is 256 — small enough to
    * stay resident at corpus scales where even the int8 form
    * ([[ivfQuantizedTopK]], 64 B) has to spill to scan. Phase 1 scores
    * candidates by ADC exactly as [[pqTopK]] (per-query literal LUTs
    * computed ONCE before the probe explode, then m array lookups per
    * pair); phase 2 re-ranks the surviving `refine * k` rows by exact
    * float cosine. All joins keyed — no nested loop anywhere
    * (scalatest-asserted like [[ivfQuantizedTopK]]).
    */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      nCentroids: Int,
      nProbe: Int,
      k: Int,
      refine: Int = 3,
      kmeansIters: Int = 0,
      pqIters: Int = 0): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    require(refine >= 1, "refine must be >= 1")
    val cents = collectCentroids(
      kmeansCentroids(corpus, idCol, vecCol, nCentroids, kmeansIters))
    val books = pqCodebooks(corpus, idCol, vecCol, dim, m, ksub, pqIters)
    val subDim = dim / m
    // index-at-rest: one pass over the scan emits (id, cell, m codes)
    val corpusCells = corpus.select(
      col(idCol).as("neighbor_id") +: cents.assign(col(vecCol)).as("cell_id") +:
        (0 until m).map { j =>
          books(j).assignPos(slice(col(vecCol), j * subDim + 1, subDim)).as(s"__c$j")
        }: _*)
    // query side: LUTs projected BEFORE the probe explode (computed once
    // per query, carried into each of the nProbe probe rows)
    val queryCells = {
      val w = Window.partitionBy("query_id").orderBy(col("__cs").desc, col("pos"))
      queries
        .select(col(idCol).as("query_id") +:
          (0 until m).map { j =>
            books(j).dots(slice(col(vecCol), j * subDim + 1, subDim)).as(s"__l$j")
          } :+ posexplode(cents.scores(col(vecCol))).as(Seq("pos", "__cs")): _*)
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= nProbe)
        .select(col("query_id") +: (0 until m).map(j => col(s"__l$j")) :+
          element_at(cents.cellIds, (col("pos") + 1).cast("int")).as("cell_id"): _*)
    }
    // probe side is <= |queries| * nProbe rows — always the build side
    // (same mis-broadcast hazard as the phase-2 note below)
    val approx = broadcast(queryCells)
      .join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        (0 until m).map(j => element_at(col(s"__l$j"), col(s"__c$j"))).reduce(_ + _))
    val cand = rankTopK(approx, refine * k).select("query_id", "neighbor_id")
    // phase-2 build side is ALWAYS the candidates: <= |queries|*refine*k
    // rows by construction. Left implicit the planner errs in both
    // directions — a sub-broadcast-threshold corpus becomes the build side
    // (measured: k<=16 scale probes broadcast the whole corpus and ran 6x
    // slower than k=64, where the corpus outgrew the threshold), and at
    // real scale the post-window cand carries no stats, risking a
    // full-corpus sort-merge shuffle.
    val rescored = broadcast(cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id")
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    rankTopK(rescored, k)
  }

  /** Coarse-quantize a corpus against FROZEN centroids: (cell_id, id) —
    * the IVF index-at-rest rows. A pure literal-centroid projection
    * (zero shuffle, no join), the same argmax as every IVF path here.
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    corpus.select(cents.assign(col(vecCol)).as("cell_id"), col(idCol))
  }

  /** Embedding distribution-drift report between two corpus snapshots —
    * the monitoring half of frozen-centroid maintenance
    * ([[ivfAppendReport]] watches the index; this watches the VECTORS):
    * per-dimension decimal-exact means of both snapshots and their
    * shift. A drifting embedding distribution silently degrades every
    * frozen artifact downstream (centroids, PQ codebooks, int8 scale
    * calibration); per-dimension mean shift is the cheap first-alarm —
    * one posexplode + one keyed aggregation per snapshot, output `dim`
    * rows. Components quantize ONCE to integer 1e-15 units with the
    * `davgQ` floor rule, then accumulate exactly — a direct
    * double→DECIMAL(38,18) cast measurably tie-rounds differently across
    * engines at this density (26-30 of 64 dims off by one ulp at
    * sf0.01), the same hazard [[graft.operators.Behavior.timeWeightedAvg]]
    * hit; 1e-15 is far below any drift-alarm threshold.
    */
  def embeddingDriftReport(before: DataFrame, after: DataFrame, vecCol: String): DataFrame = {
    def dimMeans(df: DataFrame, meanName: String, nName: String): DataFrame =
      df.select(posexplode(col(vecCol).cast("array<double>")))
        .toDF("pos", "x")
        .withColumn("pos", col("pos").cast("long"))
        .withColumn("xu", floor(col("x") * lit(1.0e15) + lit(0.5)).cast("long"))
        .groupBy("pos")
        .agg((sum(col("xu").cast("decimal(38,0)")).cast("double")
            / lit(1.0e15) / count(col("xu")).cast("double")).as(meanName),
          count(col("xu")).as(nName))
    dimMeans(before, "mean_before", "n_before")
      .join(dimMeans(after, "mean_after", "n_after"), Seq("pos"), "full_outer")
      .select(col("pos"),
        col("mean_before"), col("mean_after"),
        (col("mean_after") - col("mean_before")).as("shift"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
  }

  /** INCREMENTAL index maintenance: assign a new ingest batch against the
    * index's FROZEN centroids (re-clustering 100 TB of history for a
    * day's ingest is the thing this avoids — the standard FAISS
    * `add`-without-`train` posture) and report the resulting per-cell
    * occupancy drift. Output: one row per non-empty cell —
    * (cell_id, n_before, n_added, n_after, rebuild) where `rebuild`
    * flags the whole index once the fullest cell exceeds
    * `rebuildFactor`× the mean cell size: frozen-centroid drift shows up
    * exactly as occupancy skew, and a skewed cell is a recall hole at
    * fixed nProbe (its centroid no longer summarizes its content) AND a
    * latency tail (every probe that hits it scans it whole). The batch
    * assignment is the same zero-shuffle projection as [[ivfAssign]];
    * the report is two cell-keyed counts and a scalar.
    */
  def ivfAppendReport(oldIndex: DataFrame, batch: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, rebuildFactor: Int = 4): DataFrame = {
    require(rebuildFactor >= 1)
    val cents = collectCentroids(centroids)
    val added = batch.select(cents.assign(col(vecCol)).as("cell_id"))
      .groupBy("cell_id").agg(count(lit(1)).as("n_added"))
    val before = oldIndex.groupBy("cell_id").agg(count(lit(1)).as("n_before"))
    val merged = before.join(added, Seq("cell_id"), "full_outer")
      .select(col("cell_id"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_added"), lit(0L)).as("n_added"))
      .withColumn("n_after", col("n_before") + col("n_added"))
    val nCells = math.max(cents.cells.length, 1)
    // two-phase scalar read (the unigramSurprisal pattern), not a
    // 1-row crossJoin — a broadcast nested-loop join would trip the
    // repo-wide PlanSpec BNLJ ban for a constant the driver can hold
    val stats = merged.agg(max("n_after"), sum("n_after")).head
    val rebuild = !stats.isNullAt(0) &&
      stats.getLong(0) * nCells > rebuildFactor.toLong * stats.getLong(1)
    merged.withColumn("rebuild", lit(rebuild))
  }

  // ------------------------------------------------------------------
  // IVF index at rest: build / append / rebuild lifecycle
  // ------------------------------------------------------------------

  /** Persisted IVF index layout under `root`: `centroids/` (cell_id,
    * centroid) and `index/` (cell_id, <idCol>) parquet — the at-rest form
    * [[ivfTopK]]'s scaladoc promises ("assignments computed once and
    * persisted"). Initial build: cluster, then write both tables.
    */
  def ivfWriteIndex(corpus: DataFrame, idCol: String, vecCol: String, root: String,
      nCentroids: Int, kmeansIters: Int): Unit =
    writeIndexTo(corpus, idCol, vecCol, root, nCentroids, kmeansIters)

  private def writeIndexTo(corpus: DataFrame, idCol: String, vecCol: String,
      dest: String, nCentroids: Int, kmeansIters: Int): Unit = {
    val cents = kmeansCentroids(corpus, idCol, vecCol, nCentroids, kmeansIters)
    cents.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dest/centroids")
    ivfAssign(corpus, idCol, vecCol, cents)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dest/index")
  }

  /** Daily maintenance step against the index at `root`: assign `batch`
    * to the FROZEN persisted centroids (zero-shuffle projection), append
    * the assignments to `index/`, and return the [[ivfAppendReport]]
    * occupancy-drift report whose constant `rebuild` column says whether
    * the caller should now execute [[ivfRebuild]]. The report is computed
    * BEFORE the append lands, on oldIndex + batch — the same counts
    * either way.
    */
  def ivfAppend(spark: org.apache.spark.sql.SparkSession, batch: DataFrame,
      idCol: String, vecCol: String,
      root: String, rebuildFactor: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$root/centroids")
    val oldIdx = spark.read.parquet(s"$root/index")
    val report = ivfAppendReport(oldIdx, batch, idCol, vecCol, cents, rebuildFactor)
    ivfAssign(batch, idCol, vecCol, cents)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$root/index")
    report
  }

  /** EXECUTE the rebuild the drift rule calls for: re-run
    * [[kmeansCentroids]] over the full merged corpus and atomically swap
    * the index root (centroids AND assignments together — one two-rename
    * commit covers both, so readers never see refreshed centroids with
    * stale assignments or vice versa;
    * [[graft.sources.Layout.swapInPlace]], the [[graft.sources.Layout
    * .compact]] discipline). Because [[kmeansCentroids]] is fully
    * deterministic (seed = first k ids, decimal-exact means),
    * append…append+rebuild over a corpus equals a fresh [[ivfWriteIndex]]
    * of the same corpus row-exactly (IvfIndexSpec proves it, and
    * that a crash between the two renames leaves a complete old copy to
    * recover).
    */
  def ivfRebuild(mergedCorpus: DataFrame, idCol: String, vecCol: String, root: String,
      nCentroids: Int, kmeansIters: Int): Unit =
    graft.sources.Layout.swapInPlace(mergedCorpus.sparkSession, root)(staging =>
      writeIndexTo(mergedCorpus, idCol, vecCol, staging, nCentroids, kmeansIters))

  /** Retrieval-quality report for an approximate index: per-query
    * recall@k and reciprocal rank of the EXACT top-1 neighbor, given the
    * exact ([[bruteForceTopK]]) and approximate (any `*TopK` here) result
    * lists — the eval loop every ANN deployment runs before trading
    * recall for probe count (the IVF/PQ tuning question: "what did
    * nProbe=2 actually cost?").
    *
    * EXACT arithmetic: hits are set membership (a keyed left join),
    * `recall = n_hit / n_truth` is one double division of two exact
    * longs, and the reciprocal rank scores in units of lcm(1..maxRank)
    * (the [[graft.quality.Scoring.rrfFuse]] discipline) — `rr_units =
    * LCM / rank-of-exact-top1-in-approx-list`, 0 when the approximate
    * index missed it entirely. No float reciprocals anywhere.
    *
    * Shape: both inputs are per-query top-k lists (tiny); one keyed left
    * join + one per-query aggregation.
    *
    * Inputs need columns `(query_id, neighbor_id, rank)`; approximate
    * ranks must be ≤ `maxRank`.
    */
  def annRecall(truth: DataFrame, approx: DataFrame, maxRank: Int): DataFrame = {
    require(maxRank >= 1, "maxRank must be >= 1")
    val lcm = (1 to maxRank).map(BigInt(_)).reduce((a, b) => a * b / a.gcd(b))
    require(lcm <= BigInt(Long.MaxValue) / 4, s"lcm(1..$maxRank) too large for long units")
    val a = approx.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("__ar"))
    truth
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("__tr"))
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_truth"),
        count(col("__ar")).as("n_hit"),
        coalesce(max(when(col("__tr") === 1,
          coalesce(expr(s"${lcm.toLong}L div __ar"), lit(0L)))), lit(0L)).as("rr_units"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_truth").cast("double"))
  }

  /** nDCG@k of an approximate retriever against exact labels — the graded
    * sibling of [[annRecall]] (recall treats a rank-1 and a rank-k hit
    * alike; nDCG discounts by position, the number that actually ranks
    * two retriever configurations). Relevance is graded from the exact
    * ranking (`rel = maxRank + 1 − truth_rank`); each DCG/IDCG term is
    * quantized as `floor(rel · 1e6 / log2(rank + 1))` — the shared
    * `floor(log2·K)` residual-assumption idiom — so both sums are exact
    * longs and only the final ratio runs in mirrored doubles. Docs the
    * retriever returns OUTSIDE the truth set carry rel 0 and contribute
    * nothing, the standard convention. Output per query:
    * (query_id, dcg_u, idcg_u, ndcg).
    */
  def ndcgAtK(truth: DataFrame, approx: DataFrame, maxRank: Int): DataFrame = {
    require(maxRank >= 1, "maxRank must be >= 1")
    val t = truth.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("__tr"))
    val a = approx.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("__ar"))
    val rel = (lit(maxRank + 1L) - col("__tr")).cast("double")
    t.join(a, Seq("query_id", "neighbor_id"), "left")
      .withColumn("__dcg", when(col("__ar").isNotNull,
        floor(rel * lit(1e6) / log2((col("__ar") + 1L).cast("double"))).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("__idcg",
        floor(rel * lit(1e6) / log2((col("__tr") + 1L).cast("double"))).cast("long"))
      .groupBy("query_id")
      .agg(sum("__dcg").as("dcg_u"), sum("__idcg").as("idcg_u"))
      .withColumn("ndcg", col("dcg_u").cast("double") / col("idcg_u").cast("double"))
  }

  /** Hard-negative mining for embedding/contrastive training: each probe's
    * top-`k` nearest corpus vectors whose LABEL DIFFERS from the probe's —
    * the near-miss impostors a contrastive or reranker objective trains
    * against (the standard in-batch-negatives upgrade). Same probe-side-
    * small contract and map-side k-heap as [[bruteForceTopK]]; at corpus
    * scale feed the candidate generation through the IVF/LSH variants and
    * re-rank, exactly like the two-phase retrievers. Output:
    * (query_id, query_label, neighbor_id, neighbor_label, cosine, rank).
    */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("query_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("__nl"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id") &&
        !(col("query_label") <=> col("__nl")))
      .withColumn("cosine", graft.functions.Vectors.cosine(col("qv"), col("cv")))
    rankTopK(scored.select("query_id", "neighbor_id", "cosine"), k)
      .join(broadcast(q.select("query_id", "query_label")), "query_id")
      .join(c.select(col("neighbor_id"), col("__nl").as("neighbor_label")), "neighbor_id")
      .select("query_id", "query_label", "neighbor_id", "neighbor_label", "cosine", "rank")
  }

  /** kNN label-noise audit from ANY top-k neighbor frame (the
    * `(query_id, neighbor_id, …)` schema every retriever here emits —
    * brute force for an exact audit, IVF/LSH for the 100 TB one): per
    * probe, how many of its neighbors disagree with its label, the
    * neighborhood's majority label (ties to the lower label), and the
    * mislabel flag — the classic neighborhood-consensus label-error
    * detector (Confident-Learning-style pruning signal). Pure integer
    * counts + one mirrored double ratio; one keyed aggregation over the
    * (tiny) top-k frame plus two broadcast label joins.
    */
  def labelNoiseFromTopK(
      topk: DataFrame,
      labels: DataFrame,
      idCol: String,
      labelCol: String): DataFrame = {
    val lab = broadcast(labels.select(col(idCol).as("__lid"), col(labelCol).as("__l")))
    val joined = topk
      .join(lab, col("query_id") === col("__lid")).drop("__lid")
      .withColumnRenamed("__l", "label")
      .join(lab, col("neighbor_id") === col("__lid")).drop("__lid")
      .withColumnRenamed("__l", "__nlabel")
    val votes = joined.groupBy(col("query_id"), col("label"), col("__nlabel"))
      .agg(count(lit(1)).as("__votes"))
    votes.groupBy(col("query_id"), col("label"))
      .agg(
        sum("__votes").as("n_neighbors"),
        sum(when(!(col("__nlabel") <=> col("label")), col("__votes"))
          .otherwise(0L)).as("n_disagree"),
        max(struct(col("__votes"), (-col("__nlabel")).as("__neg")))
          .getField("__neg").as("__mneg"))
      .withColumn("majority_label", -col("__mneg"))
      .withColumn("noise_ratio",
        col("n_disagree").cast("double") / col("n_neighbors").cast("double"))
      .withColumn("flagged", !(col("majority_label") <=> col("label")))
      .drop("__mneg")
  }
}
