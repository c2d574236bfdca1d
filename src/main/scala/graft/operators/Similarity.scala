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
