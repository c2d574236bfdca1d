package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a row's words array: per-bit majority vote of
  * token-hash bits in ONE per-row pass — no explode, no 64-column vote
  * aggregation, NO SHUFFLE, no HOF (see
  * [[MinHashWordsSig]] for why the all-in-one non-HOF expression shape is
  * the one that survives Catalyst's CollapseProject).
  *
  * Parity contract (bit-for-bit with the explode -> groupBy vote form and
  * the DuckDB oracle): token hash is Spark's xxhash64 (seed 42) or the
  * md5-hex-prefix hash `conv(substr(md5(t),1,15),16,10)` (`md5 = true`);
  * vote for bit i is +1 when the hash's bit i is set else -1, summed over
  * ALL tokens (duplicates vote once each, matching the explode form); bit
  * i of the result is set iff its vote sum is > 0. Vote sums are
  * commutative, so token order never matters. An empty words array yields
  * NULL (no tokens, no hash — callers drop the row, as the explode form
  * did implicitly).
  */
case class SimHashWords(child: Expression, md5: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_words"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires an array<string> of words, got ${dt.catalogString}")
  }

  private def hashToken(s: org.apache.spark.unsafe.types.UTF8String): Long =
    if (!md5) {
      XxHash64Function.hash(s, StringType, 42L)
    } else {
      val digest = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
      val hex = new StringBuilder(15)
      var i = 0
      while (hex.length < 15) {
        val b = digest(i) & 0xff
        hex.append(Character.forDigit(b >> 4, 16))
        if (hex.length < 15) hex.append(Character.forDigit(b & 0xf, 16))
        i += 1
      }
      java.lang.Long.parseLong(hex.toString, 16)
    }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) { if (words.isNullAt(i)) return null; i += 1 }
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hashToken(words.getUTF8String(j))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashWords =
    copy(child = newChild)
}
