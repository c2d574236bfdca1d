package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NULL-INPUT TOTALITY — the row-level companion of EmptyInputSpec: real
  * corpora carry null text (failed extraction) and the occasional null id
  * (upstream join miss). No operator may throw; a null-text doc either
  * drops from token-derived outputs (it has no tokens) or carries null
  * metrics, and null ids never crash a hash/cast.
  */
class NullInputSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame = Seq(
    (1L, "normal text here more words to work with"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "normal text here more words to work with")
  ).toDF("doc_id", "text")

  test("dedup family tolerates null text") {
    // null text: md5(null) = null -> its own "digest" group; no throw
    assert(Dedup.exact(docs, "doc_id", "text").count() >= 2)
    assert(Dedup.minhashLsh(docs, "doc_id", "text",
      n = 3, k = 16, bands = 4, threshold = 0.5).count() == 1) // 1 & 4 pair up
    assert(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .filter(col("doc_id_1") === 1 && col("doc_id_2") === 4).count() == 1)
    assert(Dedup.duplicateSpans(docs, "doc_id", "text", k = 3).count() == 4)
    assert(Dedup.spanCoverage(docs, "doc_id", "text", k = 3).count() == 4)
  }

  test("round-9 family tolerates null text: HTML extraction, BPE, shard assignment") {
    // extractHtmlText: null in -> null out; empty -> empty; never throws
    val ext = docs.select(col("doc_id"),
      graft.functions.Text.extractHtmlText(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(ext(2L) == null && ext(3L) == "" && ext(1L).nonEmpty)
    // pipelineHtml over null/empty html rows: gate drops them, no throw
    val htmlDocs = docs.withColumnRenamed("text", "html")
    assert(graft.quality.CorpusClean.pipelineHtml(htmlDocs).count() <= 4)
    // BPE: vocab trains on the non-null rows; null-text docs tokenize to
    // a null struct (coalesced to zero stats by callers), empty to zero
    val vocab = graft.functions.Bpe.trainVocab(docs, "text", merges = 50)
    assert(vocab.nonEmpty)
    val st = docs.select(col("doc_id"),
      graft.functions.Bpe.tokenize(col("text"), vocab).as("st"))
      .select(col("doc_id"), col("st.n_tokens")).as[(Long, java.lang.Long)]
      .collect().toMap
    assert(st(1L) > 0 && st(2L) == null && st(3L) == 0L)
    // shard assignment is a pure id hash — null text irrelevant, total
    assert(graft.sources.Layout.shardShuffleAssignment(docs, "doc_id", 4, "s")
      .count() == 4)
  }

  test("scoring family tolerates null text") {
    // token-derived scores: null-text docs have no tokens -> absent, like
    // empty-text docs
    val us = graft.quality.Scoring.unigramSurprisal(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(us == Set(1L, 4L))
    val bs = graft.quality.Scoring.bigramSurprisal(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(bs == Set(1L, 4L))
    // per-row gates: null text rows survive with null/zero-feature metrics
    assert(graft.quality.Scoring.gopherRules(docs, "doc_id", "text").count() == 4)
    val cs = graft.quality.Scoring.hashedClassifierScore(docs, "doc_id", "text")
    assert(cs.count() == 4)
    assert(cs.filter(col("doc_id") === 3 && !col("keep")).count() == 1,
      "empty text: zero features, dropped by the keep rule")
    assert(graft.quality.Scoring.perplexityBuckets(docs, "doc_id", "text")
      .count() == 2)
  }

  test("perceptron trainer and trained scorer tolerate null text") {
    val labeled = docs.withColumn("y",
      when(col("doc_id") % 2 === 0, -1L).otherwise(1L))
    // null/empty text contributes no features; training never throws and
    // the trained weights only reflect the two featured (identical) docs
    val w = graft.quality.Scoring.trainPerceptron(labeled, "doc_id", "text", "y")
      .as[(Long, Long)].collect().toMap
    assert(w.nonEmpty)
    val scored = graft.quality.Scoring.scoreWithWeights(docs, "doc_id", "text", w)
    assert(scored.count() == 4)
    assert(scored.filter(col("doc_id").isin(2L, 3L))
      .filter(col("n_features") =!= 0L || col("keep")).count() == 0,
      "null/empty text: zero features, never kept")
  }

  test("behavioral analytics tolerate null timestamps and values") {
    val ev = Seq(
      (Some(1L), Some(10L), Some("view"), Some(1.0), Some(100L)),
      (Some(1L), None, Some("click"), Some(2.0), Some(101L)),
      (Some(2L), Some(20L), None, None, Some(102L)),
      (None, Some(30L), Some("purchase"), Some(3.0), Some(103L))
    ).toDF("user_id", "ts", "event_type", "value", "event_id")
    // funnel: null ts never satisfies the strict > chain; null types match
    // no step; null user forms its own (null-keyed) group without a throw
    val f = graft.operators.Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
    assert(f.count() == 3) // users 1, 2, null
    // twab: null ts/value rows order NULLS consistently and contribute no
    // exact-duration pairs that would throw
    graft.operators.Behavior.timeWeightedAvg(ev, "user_id", "ts", "event_id", "value").count()
    assert(graft.operators.Behavior.retentionCohorts(
      ev.withColumnRenamed("ts", "day"), "user_id", "day").count() >= 1)
  }

  test("connectedComponents drops null-id pairs instead of crashing") {
    val pairs = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L), "only the complete pair contributes")
  }
}
