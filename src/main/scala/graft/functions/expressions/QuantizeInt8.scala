package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native symmetric int8 quantization of an embedding vector: per-vector
  * max-abs scaling, `q_i = floor(x_i * 127.0 / maxabs + 0.5)` (round half
  * toward +inf — deterministic and trivially mirrored by external SQL
  * engines, unlike banker's rounding), all-zero vectors quantize to all
  * zeros. Dequantization is `q_i * (maxabs / 127.0)`, so the per-element
  * reconstruction error is bounded by `scale / 2`.
  *
  * This is the storage/bandwidth lever for the ANN family at corpus scale:
  * a 100 TB float32 embedding column scans 4x smaller as int8 for the
  * candidate-generation pass, with the float originals re-joined only for
  * the final re-rank of the tiny candidate set.
  *
  * One tight two-pass loop per row (max-abs, then quantize) inside
  * whole-stage codegen; the declarative `transform(...)` equivalent would
  * both run interpreted AND re-evaluate a computed max-abs per element
  * once CollapseProject inlines it (the repo's standard HOF trap). NULL
  * vector -> NULL; a null ELEMENT -> NULL (a partially-null embedding is
  * corrupt — refuse to quantize it rather than invent values).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantize_int8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${dt.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    var ma = 0.0
    i = 0
    while (i < n) {
      val a = math.abs(if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      if (a > ma) ma = a
      i += 1
    }
    val q = new Array[Int](n)
    if (ma > 0.0) {
      i = 0
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        q(i) = math.floor(x * 127.0 / ma + 0.5).toInt
        i += 1
      }
    }
    new GenericArrayData(q)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ma = ctx.freshName("ma")
      val a = ctx.freshName("a")
      val q = ctx.freshName("q")
      val nullElem = ctx.freshName("nullElem")
      val getX = if (elemIsFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
        |int $n = $v.numElements();
        |boolean $nullElem = false;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($v.isNullAt($i)) { $nullElem = true; break; }
        |}
        |if ($nullElem) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $ma = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $a = Math.abs($getX);
        |    if ($a > $ma) $ma = $a;
        |  }
        |  int[] $q = new int[$n];
        |  if ($ma > 0.0) {
        |    for (int $i = 0; $i < $n; $i++) {
        |      $q[$i] = (int) Math.floor($getX * 127.0 / $ma + 0.5);
        |    }
        |  }
        |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($q);
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}
