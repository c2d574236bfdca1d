package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Deterministic byte-level decode statistics over an opaque `binary`
  * payload column: `struct<byte_len: long, checksum: long, n_frames: int,
  * feature: array<double>>` — the codegen'd form of the decode seam's fake
  * metadata (checksum = unsigned byte sum, frame count from length, an
  * 8-dim feature from evenly-sampled bytes), replacing the former
  * RDD-barrier stub on the registry path so Catalyst keeps codegen and
  * column pruning through the decode step (see
  * [[graft.operators.Multimodal.decodeStub]], which remains the documented
  * seam where a real JNI/FFI codec plugs in).
  *
  * Mirrors the reference's decode-then-featurize step
  * (src/pipelines/features/defi_features_calculation.sql is tabular-only;
  * the multimodal family is the LLM-pipeline mandate, not a reference op).
  * One pass over the bytes, no allocation beyond the output row.
  */
case class DecodeStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_decode_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    DecodeStats.stats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("decodeStatsImpl", DecodeStats,
        DecodeStats.getClass.getName)
      s"""
        |${ev.value} = (InternalRow) $impl.stats($v);
        |${ev.isNull} = false;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DecodeStats =
    copy(child = newChild)
}

object DecodeStats {

  val FeatureDims = 8
  val FrameBytes = 64

  /** Byte-identical to the stub's math: checksum = Σ (b & 0xff),
    * n_frames = 1 + len/64, feature_i = bytes(min(i*len/8, len-1))/255.0
    * (zeros for an empty payload). Never null, never throws.
    */
  def stats(b: Array[Byte]): InternalRow = {
    val len = b.length
    var checksum = 0L
    var i = 0
    while (i < len) { checksum += (b(i) & 0xff); i += 1 }
    val feature = new Array[Any](FeatureDims)
    var f = 0
    while (f < FeatureDims) {
      feature(f) =
        if (len == 0) 0.0
        else (b(math.min((f.toLong * len / FeatureDims).toInt, len - 1)) & 0xff) / 255.0
      f += 1
    }
    new GenericInternalRow(Array[Any](
      len.toLong, checksum, 1 + len / FrameBytes, new GenericArrayData(feature)))
  }
}
