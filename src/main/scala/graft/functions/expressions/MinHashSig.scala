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

  private def hashShingle(s: UTF8String): Long =
    if (!md5) {
      Math.floorMod(XxHash64Function.hash(s, StringType, 42L), p)
    } else {
      // conv(substring(md5(s), 1, 15), 16, 10) cast long — 60-bit prefix
      val digest = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
      val hex = new StringBuilder(15)
      var i = 0
      while (hex.length < 15) {
        val b = digest(i) & 0xff
        hex.append(Character.forDigit(b >> 4, 16))
        if (hex.length < 15) hex.append(Character.forDigit(b & 0xf, 16))
        i += 1
      }
      Math.floorMod(java.lang.Long.parseLong(hex.toString, 16), p)
    }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements() - (n - 1)
    if (m <= 0) return null
    var i = 0
    while (i < words.numElements()) { if (words.isNullAt(i)) return null; i += 1 }
    val sig = Array.fill(k)(Long.MaxValue)
    var g = 0
    while (g < m) {
      val sb = new java.lang.StringBuilder
      var w = 0
      while (w < n) {
        if (w > 0) sb.append(' ')
        sb.append(words.getUTF8String(g + w).toString)
        w += 1
      }
      val hv = hashShingle(UTF8String.fromString(sb.toString))
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
