package graft

import graft.functions.Text
import graft.quality.Scoring
import org.apache.spark.sql.functions._

/** The distributed perceptron trainer: on a class-disjoint vocabulary the
  * learned weights must separate the training set perfectly, and round-1
  * weights must equal the independently-computed label-weighted counts.
  * (The registry row `quality_classifier_train` hash-verifies all three
  * unrolled rounds against DuckDB.)
  */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  private val pos = Seq((1L, "aaa bbb aaa", 1L), (2L, "bbb aaa", 1L), (3L, "aaa", 1L))
  private val neg = Seq((4L, "ccc ddd", -1L), (5L, "ddd ddd ccc", -1L), (6L, "ccc", -1L))
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
    // margin of each doc under the learned weights
    def margin(text: String): Long =
      text.split(" ").map(t => w.getOrElse(bucket(t, dim), 0L)).sum
    pos.foreach { case (_, t, _) => assert(margin(t) > 0, s"positive doc '$t' misclassified") }
    neg.foreach { case (_, t, _) => assert(margin(t) < 0, s"negative doc '$t' misclassified") }
  }

  test("round-1 weights are exactly the label-weighted feature counts (w0 = 0 updates on every doc)") {
    val dim = 256
    val w1 = Scoring.trainPerceptron(docs, "doc_id", "text", "y", dim = dim, iters = 1)
      .as[(Long, Long)].collect().toMap
    // by hand: aaa appears 4x in +1 docs, bbb 2x, ccc 3x / ddd 3x in -1 docs
    assert(w1(bucket("aaa", dim)) == 4L)
    assert(w1(bucket("bbb", dim)) == 2L)
    assert(w1(bucket("ccc", dim)) == -3L)
    assert(w1(bucket("ddd", dim)) == -3L)
  }
}
