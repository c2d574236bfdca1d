package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
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
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF (inverted-file) top-k: the classic two-stage ANN.
    *
    *  1. Coarse quantize: every corpus vector is assigned to its
    *     nearest-centroid cell (centroids = the deterministic first
    *     `nCentroids` corpus rows by id; broadcast join + per-vector argmax
    *     window — O(N * C) map-side work, one shuffle).
    *  2. Probe: each query searches only the `nProbe` cells whose centroids
    *     score highest for it — an equi join on cell id, so the candidate
    *     set is ~N * nProbe / nCentroids per query instead of N.
    *
    * With nProbe == nCentroids every cell is probed and the result equals
    * [[bruteForceTopK]] exactly (the scalatest recall check). At 100 TB the
    * centroid set stays driver-small (broadcast), assignments are computed
    * once and can be persisted as a bucketed table keyed by cell.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      nProbe: Int,
      k: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    val centroids = broadcast(
      corpus.orderBy(col(idCol)).limit(nCentroids)
        .select(col(idCol).as("cell_id"), col(vecCol).as("centroid")))

    def assign(df: DataFrame, id: String, out: String, keep: Int): DataFrame = {
      val scored = df.select(col(idCol).as(id), col(vecCol).as(out))
        .join(centroids)
        .withColumn("__cs", Vectors.cosine(col(out), col("centroid")))
      val w = Window.partitionBy(id).orderBy(col("__cs").desc, col("cell_id"))
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= keep)
        .select(col(id), col(out), col("cell_id"))
    }

    val corpusCells = assign(corpus, "neighbor_id", "cv", keep = 1)
    val queryCells = assign(queries, "query_id", "qv", keep = nProbe)
    val scored = queryCells
      .join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed top-k: rank within the probe's hyperplane bucket only. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int,
      k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("qv"),
      Vectors.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"),
      Vectors.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val scored = q
      .join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
