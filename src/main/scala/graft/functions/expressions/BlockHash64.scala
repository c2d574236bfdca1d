package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual block hash over an opaque `binary` payload — the
  * content fingerprint that makes multimodal near-dup possible without a
  * codec: the payload is split into 64 contiguous byte blocks (block `i`
  * covers `[i*len/64, (i+1)*len/64)` — the same even-split index walk as
  * [[DecodeStats]]'s feature sampling), and bit `i` is set iff block `i`'s
  * mean byte value strictly exceeds the whole payload's mean. This is the
  * classic blockhash/aHash construction (Yang et al., "Block Mean Value
  * Based Image Perceptual Hashing", IIH-MSP 2006) applied to the decoded-
  * stats byte regions; on real media the input would be the decoded pixel
  * / sample plane from the [[graft.operators.Multimodal.decodeStub]] seam,
  * and the hash math is unchanged.
  *
  * All comparisons are exact integer cross-multiplications
  * (`blockSum * len > total * blockLen`), never floating means, so an
  * external SQL engine reproduces every bit from the payload bytes alone.
  * The products can reach ~4·len² (blockSum ≤ 255·(len/64 + 1)), which
  * exceeds 2^63 once len passes ~1.5e9 bytes, so the compare runs through
  * an exact 128-bit cross-multiply (`Math.multiplyHigh` + unsigned-low
  * tiebreak) — bit-exact for any JVM array (len < 2^31). Empty blocks
  * (len < 64) and empty payloads contribute 0-bits; never null, never
  * throws.
  *
  * Near-dup semantics downstream: small content edits perturb a few block
  * means, so twins sit at small Hamming distance; pairs come from the same
  * pigeonhole chunk banding as SimHash ([[graft.operators.Dedup
  * .hammingPairs64]]) with exact `bit_count(xor)` verification.
  */
case class BlockHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_blockhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BlockHash64.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("blockHashImpl", BlockHash64,
        BlockHash64.getClass.getName)
      s"""
        |${ev.value} = $impl.hash($v);
        |${ev.isNull} = false;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BlockHash64 =
    copy(child = newChild)
}

object BlockHash64 {

  val Blocks = 64

  /** One pass for the total, one for the 64 block sums; bit i set iff
    * blockMean_i > totalMean, decided by exact integer cross-multiply.
    */
  def hash(b: Array[Byte]): Long = {
    val len = b.length
    if (len == 0) return 0L
    var total = 0L
    var i = 0
    while (i < len) { total += (b(i) & 0xff); i += 1 }
    var bits = 0L
    var blk = 0
    while (blk < Blocks) {
      val start = (blk.toLong * len / Blocks).toInt
      val end = ((blk + 1).toLong * len / Blocks).toInt
      var s = 0L
      var j = start
      while (j < end) { s += (b(j) & 0xff); j += 1 }
      val blockLen = end - start
      if (blockLen > 0 && cmpProducts(s, len.toLong, total, blockLen.toLong) > 0)
        bits |= (1L << blk)
      blk += 1
    }
    bits
  }

  /** Exact sign of `a*b - c*d` for non-negative longs via 128-bit
    * cross-multiply: the 64-bit products alone overflow for payloads
    * beyond ~1.5 GB (s·len ≈ 4·len²), so compare (high, low-unsigned)
    * lexicographically instead.
    */
  private[graft] def cmpProducts(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }
}
