package graft.plans

import graft.functions.expressions.DotProduct
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}

/** Optimizer rule: rewrite the declarative dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProduct]] native expression. The HOF form is the
  * natural way to write a dot product in plain Spark, but higher-order
  * functions execute interpreted (per-element lambda dispatch, outside
  * whole-stage codegen) — this rule gives any user of the declarative form
  * the native tight loop for free, the same way Spark's own optimizer
  * canonicalizes equivalent expression trees.
  *
  * The rewrite is exactly semantics-preserving — [[DotProduct]] documents
  * bit-identical behavior to this fold (double widening before multiply,
  * left-to-right accumulation from 0.0, NULL on null element or length
  * mismatch) and NativeExprSpec differential-tests it — so it fires only on
  * the precise shape: zero literal 0.0, merge lambda `acc + v` (either
  * operand order; IEEE addition is commutative), multiply of the two lambda
  * variables (either order, each optionally behind a cast to double), and
  * array element types DotProduct accepts (float/double/int).
  */
object RewriteDeclarativeDot extends Rule[LogicalPlan] {

  private def acceptedArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) | ArrayType(IntegerType, _) => true
    case _ => false
  }

  /** The lambda variable itself (already double) or a cast of it to double. */
  private def isVarAsDouble(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId && x.dataType == DoubleType
    case Cast(x: NamedLambdaVariable, DoubleType, _, _) => x.exprId == v.exprId
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(x: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      x.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(m1, m2, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(a1, a2, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if acceptedArray(a) && acceptedArray(b) &&
          ((isVarAsDouble(m1, x) && isVarAsDouble(m2, y)) ||
            (isVarAsDouble(m1, y) && isVarAsDouble(m2, x))) &&
          ((a1.semanticEquals(acc) && a2.semanticEquals(v)) ||
            (a1.semanticEquals(v) && a2.semanticEquals(acc))) &&
          isIdentityFinish(finish) =>
      DotProduct(a, b)
  }
}
