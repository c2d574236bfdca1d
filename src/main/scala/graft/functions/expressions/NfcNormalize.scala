package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd native expression — the
  * canonicalization step a multilingual pre-training pipeline runs before
  * ANY hashing: "café" with a precomposed é and "café" with e + combining
  * acute are byte-different strings that tokenize, fingerprint, MinHash
  * and exact-dedup differently while being canonically THE SAME text, so
  * an unnormalized corpus silently under-deduplicates every non-ASCII
  * language. Spark has no built-in for this (`lower`/`trim` don't touch
  * combining sequences); the JDK's `java.text.Normalizer` implements the
  * Unicode 15 canonical composition that external engines' utf8proc-based
  * `nfc_normalize` mirrors, which is what makes the op oracle-checkable.
  *
  * FAST PATH: `Normalizer.isNormalized` is a cheap scan that answers true
  * for all-ASCII and already-composed text — the overwhelming majority of
  * a real corpus — skipping the allocating normalize call, and the
  * UTF8String round-trips untouched. NULL in -> NULL out.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("nfcNormalizeImpl", NfcNormalize,
        NfcNormalize.getClass.getName)
      s"${ev.value} = (UTF8String) $impl.normalize($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
