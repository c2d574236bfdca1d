package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst dot product over two numeric arrays.
  *
  * The declarative formulation — `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * — is semantically right but executes INTERPRETED: Spark's higher-order
  * functions fall out of whole-stage codegen and pay per-element lambda
  * dispatch, which dominates ANN workloads (corpus x centroids x dim
  * evaluations). This expression generates a tight primitive loop instead
  * (`doGenCode`), with an interpreted `nullSafeEval` fallback.
  *
  * Semantics mirror the HOF version bit-for-bit so the DuckDB oracle
  * parity holds: elements are widened to double BEFORE multiplying, the
  * accumulation is sequential left-to-right from 0.0, any null element
  * (or length mismatch, where zip_with would pad with null) yields NULL.
  *
  * Inputs must be array<float>, array<double>, or array<int> — int
  * elements serve the quantized-embedding path, where |q| <= 127 keeps
  * every product and partial sum exactly representable in the double
  * accumulator, so the result equals exact integer arithmetic. (Callers
  * are internal; see [[org.apache.spark.sql.graftnative.NativeColumns]]
  * for the Column entry point.)
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  // registered as a public SQL function (graft_dot), so arbitrary argument
  // types reach analysis: reject everything but array<float>/array<double>
  // here rather than ClassCastException-ing (or mis-reading UnsafeArrayData)
  // at execution time
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) | ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName requires two array<float>, array<double>, or array<int> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemKind(e: Expression): Char =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => 'f'
      case IntegerType => 'i'
      case _ => 'd'
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (l, r) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = l.numElements()
    if (n != r.numElements()) return null
    val (lk, rk) = (elemKind(left), elemKind(right))
    def get(a: ArrayData, kind: Char, i: Int): Double = kind match {
      case 'f' => a.getFloat(i).toDouble
      case 'i' => a.getInt(i).toDouble
      case _ => a.getDouble(i)
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return null
      val x = get(l, lk, i)
      val y = get(r, rk, i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def getter(v: String, kind: Char): String = kind match {
        case 'f' => s"(double) $v.getFloat($i)"
        case 'i' => s"(double) $v.getInt($i)"
        case _ => s"$v.getDouble($i)"
      }
      val getL = getter(l, elemKind(left))
      val getR = getter(r, elemKind(right))
      s"""
        |int $n = $l.numElements();
        |if ($n != $r.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $acc += $getL * $getR;
        |  }
        |  if (!${ev.isNull}) ${ev.value} = $acc;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
