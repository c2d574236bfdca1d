package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native L2 normalization of a vector: `x_i / ||x||` as array<double>,
  * with the norm accumulated left-to-right from 0.0 (the same fold order
  * as `sqrt(dot(v, v))`, so external engines mirror it term for term —
  * sqrt and divide are IEEE-correctly-rounded, keeping every output
  * bit-exact across engines). The all-zero vector normalizes to all
  * zeros (no 0/0 NaNs poisoning downstream dot products).
  *
  * Pre-normalizing turns repeated cosine evaluations into plain dots —
  * the standard at-rest layout for an ANN corpus, where each vector is
  * read once but scored against thousands of probes. One two-pass loop
  * per row inside codegen; the declarative `transform(v, x -> x / norm)`
  * would re-evaluate the computed norm PER ELEMENT once CollapseProject
  * inlines it (the repo's standard HOF trap). NULL vector -> NULL; null
  * element -> NULL (corrupt embedding, refuse).
  */
case class NormalizeVec(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2_normalize"

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
    var acc = 0.0
    i = 0
    while (i < n) {
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      acc += x * x
      i += 1
    }
    val norm = math.sqrt(acc)
    val out = new Array[Double](n)
    if (norm > 0.0) {
      i = 0
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = x / norm
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
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
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $acc += $getX * $getX;
        |  }
        |  double $norm = Math.sqrt($acc);
        |  double[] $out = new double[$n];
        |  if ($norm > 0.0) {
        |    for (int $i = 0; $i < $n; $i++) {
        |      $out[$i] = $getX / $norm;
        |    }
        |  }
        |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeVec =
    copy(child = newChild)
}
