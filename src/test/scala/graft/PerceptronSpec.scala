package graft

import graft.functions.Text
import graft.quality.Scoring
import org.apache.spark.sql.functions._

/** The distributed perceptron trainer + trained-weight scorer: on a
  * class-disjoint vocabulary the learned weights must separate the
  * training set perfectly, and round-1 weights must equal the
  * independently-computed label-weighted counts. Docs are single words so
  * the (unigram + bigram) feature space reduces to hand-checkable
  * unigrams. (The registry rows `quality_classifier_train`/`_apply`
  * hash-verify all three unrolled rounds against DuckDB.)
  */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  private val pos = Seq((1L, "aaa", 1L), (2L, "bbb", 1L), (3L, "aaa", 1L))
  private val neg = Seq((4L, "ccc", -1L), (5L, "ddd", -1L), (6L, "ddd", -1L))
  private def docs = (pos ++ neg).toDF("doc_id", "text", "y")

  private def bucket(word: String, dim: Int): Long =
    Seq(word).toDF("w")
      .select(pmod(Text.md5Hash64(col("w")), lit(dim.toLong)).as("f"))
      .as[Long].head()

  test("disjoint-vocabulary classes are perfectly separated by the trained weights") {
    val dim = 256
    val buckets = Seq("aaa", "bbb", "ccc", "ddd").map(bucket(_, dim))
    assume(buckets.distinct.size == 4, "hash collision in fixture vocabulary")
    val w = Scoring.trainPerceptron(docs, "doc_id", "text", "y", dim = dim, iters = 3)
      .as[(Long, Long)].collect().toMap
    pos.foreach { case (_, t, _) =>
      assert(w(bucket(t, dim)) > 0, s"positive doc '$t' misclassified") }
    neg.foreach { case (_, t, _) =>
      assert(w(bucket(t, dim)) < 0, s"negative doc '$t' misclassified") }
  }

  test("round-1 weights are exactly the label-weighted feature counts (w0 = 0 updates on every doc)") {
    val dim = 256
    val w1 = Scoring.trainPerceptron(docs, "doc_id", "text", "y", dim = dim, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(w1(bucket("aaa", dim)) == 2L)
    assert(w1(bucket("bbb", dim)) == 1L)
    assert(w1(bucket("ccc", dim)) == -1L)
    assert(w1(bucket("ddd", dim)) == -2L)
  }

  test("train -> apply loop: the trained literal-map scorer reproduces the labels") {
    val dim = 256
    val w = Scoring.trainPerceptron(docs, "doc_id", "text", "y", dim = dim, iters = 3)
      .as[(Long, Long)].collect().toMap
    val scored = Scoring.scoreWithWeights(docs, "doc_id", "text", w, dim = dim)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    (pos ++ neg).foreach { case (id, _, y) =>
      assert(scored(id) == (y > 0), s"doc $id keep != label")
    }
    // empty weights: total, everything scores 0 / keep=false
    val zero = Scoring.scoreWithWeights(docs, "doc_id", "text", Map.empty, dim = dim)
    assert(zero.where(col("score_int") =!= 0L || col("keep")).count() == 0)
  }
}
