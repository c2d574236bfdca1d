package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature straight from a row's WORDS array: word
  * n-gram shingling, shingle hashing, and the K per-permutation minima of
  * `(a_k * h + b_k) mod p` all happen in one per-row pass — no explode, no
  * aggregation, NO SHUFFLE, and crucially NO higher-order function.
  *
  * Why the all-in-one shape (learned the hard way): a staged declarative
  * pipeline (`words -> shingles -> transform(hash) -> minima`) looks
  * equivalent, but Catalyst's CollapseProject merges the projections and
  * interpreted HOF lambdas then re-evaluate the collapsed-in array
  * expression PER ELEMENT — re-tokenizing the document O(shingles) times
  * (measured: a 15x slowdown on the LSH pipeline). The original
  * explode -> groupBy -> K mins shape dodged that via the Generate barrier
  * but paid a full shuffle of every (doc, shingle-hash) row. A plain
  * (non-HOF) expression evaluates its child ONCE per row, so this form is
  * both collapse-proof and shuffle-free.
  *
  * Parity contract (bit-for-bit with the aggregate form and the DuckDB
  * oracle): shingles are the space-joined word n-grams (duplicates need no
  * dedup — `min` is idempotent); `md5 = false` hashes each shingle with
  * Spark's own xxhash64 (seed 42, via `XxHash64Function`), `md5 = true`
  * reproduces `conv(substr(md5(s), 1, 15), 16, 10)` — the DuckDB-computable
  * 60-bit md5 prefix; both reduce mod `p` before the permutation products
  * so nothing overflows a long. Fewer than n words -> NULL (no shingles,
  * no signature — callers drop the row, as the explode form did
  * implicitly).
  *
  * `CodegenFallback` is deliberate: the per-row work is hashing (already
  * plain JVM calls), so generated-vs-interpreted dispatch is noise here,
  * and the fallback keeps the md5/xxhash implementations in ONE place.
  */
case class MinHashWordsSig(
    child: Expression,
    n: Int,
    md5: Boolean,
    as: Seq[Long],
    bs: Seq[Long],
    p: Long)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")
  require(as.nonEmpty && as.length == bs.length, "need matching a/b coefficient vectors")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_words_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires an array<string> of words, got ${dt.catalogString}")
  }

  private val k = as.length
  private val aArr = as.toArray
  private val bArr = bs.toArray

  // MessageDigest is stateful and not thread-safe; a ThreadLocal survives
  // any sharing of this expression instance across tasks. @transient: the
  // expression ships to executors, the digest must not.
  @transient private lazy val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Hash of the shingle bytes in `buf[0, len)` — the expression's whole
    * point is the hot path, so no per-shingle allocations: the xx path
    * wraps the buffer region as a UTF8String view (no copy), the md5 path
    * reuses the thread's digest and parses the 60-bit prefix
    * (`conv(substr(md5(s),1,15),16,10)` = the first 15 nibbles big-endian)
    * straight from the digest bytes, no hex string.
    */
  private def hashShingle(buf: Array[Byte], len: Int): Long =
    if (!md5) {
      Math.floorMod(
        XxHash64Function.hash(UTF8String.fromBytes(buf, 0, len), StringType, 42L), p)
    } else {
      val d = md5Local.get()
      d.update(buf, 0, len)
      val digest = d.digest() // resets the digest for the next shingle
      var acc = 0L
      var i = 0
      while (i < 7) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
      acc = (acc << 4) | ((digest(7) & 0xffL) >> 4)
      Math.floorMod(acc, p)
    }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val total = words.numElements()
    val m = total - (n - 1)
    if (m <= 0) return null
    var i = 0
    while (i < total) { if (words.isNullAt(i)) return null; i += 1 }
    val sig = Array.fill(k)(Long.MaxValue)
    // one shingle byte buffer reused across the whole row, grown on demand
    var buf = new Array[Byte](128)
    var g = 0
    while (g < m) {
      var len = 0
      var w = 0
      while (w < n) {
        val ws = words.getUTF8String(g + w)
        val nb = ws.numBytes()
        val need = len + nb + (if (w > 0) 1 else 0)
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, need))
        if (w > 0) { buf(len) = ' '; len += 1 }
        ws.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
        len += nb
        w += 1
      }
      val hv = hashShingle(buf, len)
      var kk = 0
      while (kk < k) {
        val v = Math.floorMod(hv * aArr(kk) + bArr(kk), p)
        if (v < sig(kk)) sig(kk) = v
        kk += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashWordsSig =
    copy(child = newChild)
}
