package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-executor lazily-deserialized view of a broadcast bloom filter.
  * Serializing this holder ships only the Broadcast HANDLE; each executor
  * fetches the bytes once over the torrent protocol and deserializes once
  * (lazy val), however many tasks probe it.
  */
final class BroadcastBloom(val bc: Broadcast[Array[Byte]]) extends Serializable {
  @transient lazy val filter: BloomFilter = BloomFilter.readFrom(bc.value)
  def mightContainLong(h: Long): Boolean = filter.mightContainLong(h)
}

/** Bloom membership probe whose filter rides a BROADCAST VARIABLE instead
  * of a plan literal (Spark's own [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * requires a foldable filter — a literal — which serializes the whole
  * filter into EVERY task closure; at the sizes an ingest-dedup filter
  * reaches, hundreds of MB, per-task shipping dominates the job). The
  * expression itself serializes as the tiny broadcast handle; bytes move
  * once per executor and deserialize once ([[BroadcastBloom]]).
  *
  * Semantics identical to BloomFilterMightContain over xxhash64 keys:
  * false positives possible, false negatives never; NULL hash -> NULL.
  */
case class BloomProbe(bloom: BroadcastBloom, child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a bigint hash argument (xxhash64 keying), got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      // the reference ships as the broadcast handle; .filter deserializes
      // once per executor on first use
      val holder = ctx.addReferenceObj("bloomHolder", bloom, classOf[BroadcastBloom].getName)
      s"${ev.value} = $holder.mightContainLong($h);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}
