package graft.sources

/** SPI for an EXTERNAL document/KV store — the serving-database seam the
  * reference fills with MongoDB (`features_db.defi_features`, key-matched
  * bulk upserts of feature documents:
  * `src/pipelines/features/save_defi_features_features_db.py:28-34`,
  * fan-out via a ThreadPoolExecutor over row chunks `:78-84`).
  *
  * The Spark-native replacement ([[graft.operators.DocStoreSink]]) drives
  * this interface from `foreachPartition`: Spark's own task parallelism
  * replaces the thread pool, one writer (connection) per partition
  * replaces the per-chunk client, and the store's key-matched
  * seq-guarded replace makes at-least-once task execution (retries,
  * speculation) converge to exactly-once EFFECT.
  *
  * A production implementation wraps the vendor client (a Mongo
  * `bulkWrite` of `ReplaceOne(upsert=true)` filtered on
  * `{_id: key, _seq: {$lte: seq}}`). This sandbox has no egress and no
  * vendor driver, so the shipped implementation is [[MemDocStore]] — a
  * JVM-global store (executors share the JVM under `local[*]`) with
  * injectable transient failures for the retry/idempotence specs.
  */
trait DocStore extends Serializable {
  /** One writer per task/partition — the connection-per-partition rule:
    * opened inside `foreachPartition`, never serialized from the driver.
    */
  def open(): DocStoreWriter
}

/** A live store connection. Implementations must make each DOCUMENT's
  * replace atomic and seq-guarded (replace iff `seq >= stored seq`);
  * batch atomicity is NOT required (unordered bulk semantics — a batch
  * that fails midway may have applied a prefix, and the caller's retry
  * re-applies the whole batch, which the seq guard absorbs).
  */
trait DocStoreWriter {
  /** Key-matched upsert of `(key, seq, docJson)` documents: replace iff
    * `seq >= stored` (`>=`, not `>`: the reference's replace-with-equal
    * -content call is idempotent, and a task retry re-writes the same
    * (key, seq)).
    */
  def upsertBatch(batch: Array[(String, Long, String)]): Unit

  /** Key-matched tombstone of `(key, seq)`: the document is removed iff
    * `seq >= stored`, and the store KEEPS the seq high-water mark for the
    * key (a sticky marker, the CDC discipline) so a replayed OLDER upsert
    * can never resurrect a deleted document. Marker GC is the store's
    * concern (TTL / compaction), like any tombstone.
    */
  def deleteBatch(batch: Array[(String, Long)]): Unit

  def close(): Unit
}

/** JVM-global in-memory [[DocStore]] — the sandbox reference
  * implementation and spec harness. Named stores so concurrent specs
  * don't collide; `injectTransientFailures(n)` makes the next `n` batch
  * calls (across all writers of that store) throw `IOException`, driving
  * the sink's retry path.
  *
  * State per key: `(seq, Some(json))` for a live document,
  * `(seq, None)` for a delete marker (sticky tombstone).
  */
final class MemDocStore(name: String) extends DocStore {
  override def open(): DocStoreWriter = new DocStoreWriter {
    private val m = MemDocStore.store(name)

    private def maybeFail(): Unit = {
      val f = MemDocStore.failures(name)
      if (f.get() > 0 && f.decrementAndGet() >= 0)
        throw new java.io.IOException(s"injected transient failure ($name)")
    }

    override def upsertBatch(batch: Array[(String, Long, String)]): Unit = {
      maybeFail()
      batch.foreach { case (k, seq, json) =>
        m.merge(k, (seq, Some(json)),
          (old, neu) => if (neu._1 >= old._1) neu else old)
      }
    }

    override def deleteBatch(batch: Array[(String, Long)]): Unit = {
      maybeFail()
      batch.foreach { case (k, seq) =>
        m.merge(k, (seq, None),
          (old, neu) => if (neu._1 >= old._1) neu else old)
      }
    }

    override def close(): Unit = ()
  }
}

object MemDocStore {
  private val stores = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, (Long, Option[String])]]()
  private val pendingFailures = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()

  private def store(name: String) =
    stores.computeIfAbsent(name,
      _ => new java.util.concurrent.ConcurrentHashMap[String, (Long, Option[String])]())

  private def failures(name: String) =
    pendingFailures.computeIfAbsent(name,
      _ => new java.util.concurrent.atomic.AtomicInteger(0))

  /** Live documents (delete markers excluded): key -> (seq, json). */
  def contents(name: String): Map[String, (Long, String)] = {
    val out = Map.newBuilder[String, (Long, String)]
    store(name).forEach { (k, v) =>
      v match { case (seq, Some(json)) => out += k -> ((seq, json)); case _ => () }
    }
    out.result()
  }

  /** Raw state incl. delete markers: key -> (seq, Option(json)). */
  def rawContents(name: String): Map[String, (Long, Option[String])] = {
    val out = Map.newBuilder[String, (Long, Option[String])]
    store(name).forEach { (k, v) => out += k -> v }
    out.result()
  }

  def clear(name: String): Unit = { store(name).clear(); failures(name).set(0) }

  /** The next `n` batch calls against store `name` throw IOException. */
  def injectTransientFailures(name: String, n: Int): Unit = failures(name).set(n)
}
