package graft.operators

import graft.sources.{DocStore, DocStoreWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The EXTERNAL serving-database sink — the reference's "push the
  * computed feature documents into MongoDB" leg
  * (`src/pipelines/features/save_defi_features_features_db.py:28-34`:
  * key-matched `update_documents(..., upsert=True)` on `walletAddress`,
  * row chunks fanned out over a ThreadPoolExecutor `:78-84`), re-expressed
  * for Spark's execution model:
  *
  *  - documents are built COLUMN-SIDE (`to_json(struct(...))`, codegen'd)
  *    so only (key, seq, json) strings reach the writer — no Row
  *    reflection in the hot loop;
  *  - `foreachPartition` opens ONE [[graft.sources.DocStoreWriter]] per
  *    partition (the connection-per-partition rule) and ships BATCHED
  *    bulk upserts of `batchSize` documents;
  *  - transient write failures retry with exponential backoff; retries
  *    exhausted fail the TASK, and Spark's task retry re-runs the
  *    partition — safe because every write is key-matched and
  *    seq-guarded, so at-least-once execution (task retries, speculative
  *    duplicates, whole-job replays) converges to exactly-once EFFECT;
  *  - per-key resolution happens BEFORE the writes: each job writes at
  *    most ONE operation per key (the (seq, op-rank) argmax), so writes
  *    for a key can never race each other within a job and partition
  *    replay order is irrelevant.
  *
  * At 100 TB the frame feeding this sink is serve-schema-projected and
  * group-resolved (corpus-sized state stays in the table format; ONLY
  * the churn reaches the external store), and the store's write capacity
  * — not Spark — is the bottleneck: cap parallelism by coalescing to the
  * store's connection budget (`maxConnections`).
  */
object DocStoreSink {

  /** Upsert every row as a document keyed by `keyCol`. `seqCol` (a long;
    * commit version / batch id / epoch) makes replays and task retries
    * no-ops — omit it only for content-idempotent full refreshes (the
    * reference's daily shape), where it defaults to 0 and replace-equal
    * is the idempotence. Returns the number of documents written.
    */
  def upsertDocuments(
      df: DataFrame,
      store: DocStore,
      keyCol: String,
      seqCol: Option[String] = None,
      batchSize: Int = 500,
      maxRetries: Int = 3,
      backoffMs: Long = 100L,
      maxConnections: Int = 0): Long = {
    val docCols = df.columns.filterNot(seqCol.contains).toSeq
    val seq = seqCol.map(col(_).cast("long")).getOrElse(lit(0L))
    val shaped0 = df.select(
      col(keyCol).cast("string").as("_k"),
      seq.as("_seq"),
      to_json(struct(docCols.map(col): _*)).as("_doc"))
    val shaped = if (maxConnections > 0) shaped0.coalesce(maxConnections) else shaped0
    val written = df.sparkSession.sparkContext.longAccumulator("docstore_upserts")
    shaped.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      withWriter(store) { w =>
        it.grouped(batchSize).foreach { g =>
          val batch = g.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toArray
          retry(maxRetries, backoffMs)(w.upsertBatch(batch))
          written.add(batch.length)
        }
      }
    }
    written.value
  }

  /** Apply a CDC change batch (`opCol` in I/U/D, `seqCol` long) to the
    * store: per key, ONLY the (seq, op-rank) argmax operation is shipped
    * (D outranks U/I at the same seq — the repo-wide CDC rule), then D
    * tombstones and I/U replaces go through the same batched, retried,
    * seq-guarded writer. Delete markers are sticky in the store, so a
    * replayed older upsert can never resurrect a deleted key. Returns
    * (upserts, deletes) shipped.
    */
  def applyChanges(
      changes: DataFrame,
      store: DocStore,
      keyCol: String,
      seqCol: String,
      opCol: String = "op",
      batchSize: Int = 500,
      maxRetries: Int = 3,
      backoffMs: Long = 100L,
      maxConnections: Int = 0): (Long, Long) = {
    val docCols = changes.columns.filterNot(c => c == seqCol || c == opCol).toSeq
    val rank = when(col(opCol) === "D", 2).when(col(opCol) === "U", 1).otherwise(0)
    val resolved0 = changes
      .select(
        col(keyCol).cast("string").as("_k"),
        struct(col(seqCol).cast("long").as("_seq"), rank.as("_rank"),
          col(opCol).as("_op"),
          to_json(struct(docCols.map(col): _*)).as("_doc")).as("_c"))
      .groupBy("_k").agg(max("_c").as("_c")) // (seq, op-rank) argmax per key
      .select(col("_k"), col("_c._seq").as("_seq"), col("_c._op").as("_op"),
        col("_c._doc").as("_doc"))
    val resolved = if (maxConnections > 0) resolved0.coalesce(maxConnections) else resolved0
    val sc = changes.sparkSession.sparkContext
    val ups = sc.longAccumulator("docstore_upserts")
    val dels = sc.longAccumulator("docstore_deletes")
    resolved.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      withWriter(store) { w =>
        it.grouped(batchSize).foreach { g =>
          val (d, u) = g.partition(_.getString(2) == "D")
          if (u.nonEmpty) {
            val batch = u.map(r => (r.getString(0), r.getLong(1), r.getString(3))).toArray
            retry(maxRetries, backoffMs)(w.upsertBatch(batch))
            ups.add(batch.length)
          }
          if (d.nonEmpty) {
            val batch = d.map(r => (r.getString(0), r.getLong(1))).toArray
            retry(maxRetries, backoffMs)(w.deleteBatch(batch))
            dels.add(batch.length)
          }
        }
      }
    }
    (ups.value, dels.value)
  }

  private def withWriter[T](store: DocStore)(f: DocStoreWriter => T): T = {
    val w = store.open()
    try f(w) finally w.close()
  }

  /** Re-run `f` up to `maxRetries` extra times on non-fatal failure,
    * exponential backoff. The whole batch re-applies on retry — safe by
    * the store's per-document seq guard (unordered-bulk semantics).
    */
  private def retry(maxRetries: Int, backoffMs: Long)(f: => Unit): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { f; done = true } catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxRetries) throw e
          Thread.sleep(backoffMs << attempt)
          attempt += 1
      }
    }
  }
}
