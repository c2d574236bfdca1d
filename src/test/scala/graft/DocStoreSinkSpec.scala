package graft

import graft.operators.DocStoreSink
import graft.sources.MemDocStore
import org.apache.spark.sql.functions._

/** The external document-store sink: per-partition batched bulk writes,
  * retry-on-transient-failure, and the seq-guarded replace that turns
  * at-least-once execution (task retries, whole-job replays, out-of-order
  * arrivals) into exactly-once EFFECT — plus the CDC form's per-key
  * argmax resolution and sticky delete markers.
  */
class DocStoreSinkSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): String = { n += 1; s"docstorespec_$n" }

  private def docsOf(name: String): Map[String, String] =
    MemDocStore.contents(name).map { case (k, (_, json)) => k -> json }

  test("upserts land the latest document per key across a shuffled multi-partition frame") {
    val name = fresh(); MemDocStore.clear(name)
    val df = new scala.util.Random(11).shuffle(
      (1L to 500L).map(i => (s"w$i", i * 2, s"v${i % 7}")))
      .toDF("wallet", "score", "tag").repartition(13)
    val written = DocStoreSink.upsertDocuments(
      df, new MemDocStore(name), "wallet", batchSize = 32, backoffMs = 1L)
    assert(written == 500)
    val got = docsOf(name)
    assert(got.size == 500)
    assert(got("w7") == """{"wallet":"w7","score":14,"tag":"v0"}""")
  }

  test("a whole-job replay and an equal-content re-push are no-ops (store state identical)") {
    val name = fresh(); MemDocStore.clear(name)
    val df = (1L to 200L).map(i => (s"w$i", i)).toDF("wallet", "score")
    DocStoreSink.upsertDocuments(df, new MemDocStore(name), "wallet", backoffMs = 1L)
    val once = MemDocStore.rawContents(name)
    DocStoreSink.upsertDocuments(df, new MemDocStore(name), "wallet", backoffMs = 1L)
    assert(MemDocStore.rawContents(name) == once, "replay must not change the store")
  }

  test("seq guard: an older job can never clobber a newer document") {
    val name = fresh(); MemDocStore.clear(name)
    val store = new MemDocStore(name)
    val newer = (1L to 50L).map(i => (s"w$i", 2L, "new")).toDF("wallet", "v", "gen")
    val older = (1L to 50L).map(i => (s"w$i", 1L, "old")).toDF("wallet", "v", "gen")
    DocStoreSink.upsertDocuments(newer, store, "wallet", seqCol = Some("v"), backoffMs = 1L)
    DocStoreSink.upsertDocuments(older, store, "wallet", seqCol = Some("v"), backoffMs = 1L)
    assert(docsOf(name).values.forall(_.contains("\"gen\":\"new\"")),
      "the late-arriving older generation must lose everywhere")
    // seqCol is excluded from the stored document
    assert(!docsOf(name)("w1").contains("\"v\""))
  }

  test("transient failures retry to success; exhausted retries fail the job, a re-run converges") {
    val name = fresh(); MemDocStore.clear(name)
    val df = (1L to 100L).map(i => (s"w$i", i)).toDF("wallet", "score").coalesce(2)
    MemDocStore.injectTransientFailures(name, 3) // < retries x partitions: absorbed
    DocStoreSink.upsertDocuments(df, new MemDocStore(name), "wallet",
      batchSize = 10, maxRetries = 3, backoffMs = 1L)
    assert(docsOf(name).size == 100)
    // now more failures than the budget on SOME batch: the job fails...
    MemDocStore.clear(name)
    MemDocStore.injectTransientFailures(name, 1000)
    intercept[org.apache.spark.SparkException] {
      DocStoreSink.upsertDocuments(df, new MemDocStore(name), "wallet",
        batchSize = 10, maxRetries = 1, backoffMs = 1L)
    }
    // ...and the caller's re-run (at-least-once) still converges exactly
    MemDocStore.injectTransientFailures(name, 0)
    DocStoreSink.upsertDocuments(df, new MemDocStore(name), "wallet",
      batchSize = 10, maxRetries = 1, backoffMs = 1L)
    assert(docsOf(name).size == 100)
  }

  test("CDC apply: per-key (seq, op-rank) argmax ships ONE op; D is sticky against older replays") {
    val name = fresh(); MemDocStore.clear(name)
    val store = new MemDocStore(name)
    val changes = Seq(
      ("w1", 1L, "I", 10), ("w1", 3L, "U", 30),           // w1: live at seq 3
      ("w2", 1L, "I", 20), ("w2", 2L, "D", 0),            // w2: deleted
      ("w3", 5L, "U", 50), ("w3", 5L, "D", 0),            // same-seq tie: D outranks U
      ("w4", 7L, "I", 70)
    ).toDF("wallet", "seq", "op", "score").repartition(5)
    val (ups, dels) = DocStoreSink.applyChanges(
      changes, store, "wallet", "seq", batchSize = 2, backoffMs = 1L)
    assert(ups == 2 && dels == 2, s"argmax must ship one op per key, got ($ups, $dels)")
    val got = docsOf(name)
    assert(got.keySet == Set("w1", "w4"))
    assert(got("w1").contains("\"score\":30"))
    // a REPLAYED older upsert for a deleted key cannot resurrect it
    val late = Seq(("w2", 1L, "I", 20)).toDF("wallet", "seq", "op", "score")
    DocStoreSink.applyChanges(late, store, "wallet", "seq", backoffMs = 1L)
    assert(!docsOf(name).contains("w2"), "delete markers must be sticky")
    // but a genuinely NEWER insert re-creates it
    val reborn = Seq(("w2", 9L, "I", 99)).toDF("wallet", "seq", "op", "score")
    DocStoreSink.applyChanges(reborn, store, "wallet", "seq", backoffMs = 1L)
    assert(docsOf(name)("w2").contains("\"score\":99"))
  }

  test("batch size does not change the outcome; maxConnections caps the writer fan-in") {
    val a = fresh(); MemDocStore.clear(a)
    val b = fresh(); MemDocStore.clear(b)
    val df = (1L to 333L).map(i => (s"w$i", i)).toDF("wallet", "score").repartition(17)
    DocStoreSink.upsertDocuments(df, new MemDocStore(a), "wallet",
      batchSize = 1, backoffMs = 1L)
    DocStoreSink.upsertDocuments(df, new MemDocStore(b), "wallet",
      batchSize = 1000, maxConnections = 2, backoffMs = 1L)
    assert(docsOf(a) == docsOf(b))
  }
}
