package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Optimizer rule (SURVEY §4.3(c), registered via
  * [[GraftExtensions]].injectOptimizerRule): rewrite the declarative
  * dot-product pattern
  *
  * {{{
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  * }}}
  *
  * into the codegen'd [[DotProduct]] kernel. The HOF form interprets its
  * lambdas per element and allocates the zipped array per row (measured
  * 100-1000× slower in pairwise similarity BENCH); users who write the
  * natural declarative form get the kernel for free.
  *
  * Semantics-preserving by construction, so the rewrite only fires when it
  * is EXACTLY equivalent:
  *   - both element types are non-nullable float/double (a null element
  *     makes the HOF null, which DotProduct does not reproduce);
  *   - the rewritten form guards on equal lengths — `zip_with` null-pads
  *     the shorter array (HOF → null) while DotProduct dots the common
  *     prefix, so unequal lengths fall back to null, matching the HOF;
  *   - accumulation order (left-to-right, double) is identical, so results
  *     are bit-for-bit equal.
  * Casts to double inside the multiply lambda are accepted; any other
  * lambda body is left untouched.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if isProductOf(mul, x, y) && isSumOf(add, acc, v) &&
            fin.exprId == fv.exprId &&
            nonNullFloating(a.dataType) && nonNullFloating(b.dataType) =>
        If(EqualTo(Size(a), Size(b)),
          DotProduct(a, b),
          Literal(null, DoubleType))
    }

  private def nonNullFloating(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, containsNull) => !containsNull
    case _ => false
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case _ => e
  }

  /** The multiply operand must EVALUATE IN DOUBLE for the rewrite to be
    * exact: either the variable is already double, or it is explicitly
    * cast to double. A raw float×float multiply rounds the product to
    * float — DotProduct's double product would differ in the low bits, so
    * that shape is declined (see the float-no-cast regression test).
    */
  private def doubleVarOf(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable if v.dataType == DoubleType => Some(v)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
    case _ => None
  }

  private def isProductOf(e: Expression,
      x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean = e match {
    case Multiply(l, r, _) => (doubleVarOf(l), doubleVarOf(r)) match {
      case (Some(lv), Some(rv)) =>
        (lv.exprId == x.exprId && rv.exprId == y.exprId) ||
          (lv.exprId == y.exprId && rv.exprId == x.exprId)
      case _ => false
    }
    case _ => false
  }

  /** The accumulator is double by construction (zero literal 0.0D); a cast
    * on the element side is only double-widening of an already-double
    * product once [[isProductOf]] holds, so stripping it is exact.
    */
  private def isSumOf(e: Expression,
      acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean = e match {
    case Add(l, r, _) => (stripCast(l), stripCast(r)) match {
      case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
        (lv.exprId == acc.exprId && rv.exprId == v.exprId) ||
          (lv.exprId == v.exprId && rv.exprId == acc.exprId)
      case _ => false
    }
    case _ => false
  }
}
