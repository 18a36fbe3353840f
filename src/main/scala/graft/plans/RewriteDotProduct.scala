package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule (SURVEY.md §4 showcase): rewrites the declarative
  * dot-product idiom
  *
  *   aggregate(zip_with(CAST(a), CAST(b), (x, y) -> x * y),
  *             0.0D, (acc, v) -> acc + v)
  *
  * over float arrays into the codegen'd
  * [[graft.functions.DotProduct]] expression, so
  * user code written in the portable higher-order-function form gets
  * the native ~10× per-row implementation automatically.
  * Value-preserving for equal-length arrays (the engine's embedding
  * invariant — both forms then do identical left-to-right double
  * accumulation); mismatched lengths keep the HOF form's semantics
  * only if unrewritten, so this rule is registered via
  * [[graft.GraftRewriteExtensions]] (NOT the function-registration
  * [[graft.GraftExtensions]]) / experimental.extraOptimizations as an
  * opt-in, the standard contract for semantic-narrowing rewrites.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def floatArray(e: Expression): Option[Expression] = e match {
    case c: Cast => floatArray(c.child)
    case _ => e.dataType match {
      case ArrayType(FloatType, _) => Some(e)
      case _ => None
    }
  }

  private def isMulOfVars(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply, args, _) =>
      args.length == 2 &&
        m.children.collect { case v: NamedLambdaVariable => v.exprId }.toSet ==
          args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
    case _ => false
  }

  private def isAddOfVars(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add, args, _) =>
      args.length == 2 &&
        a.children.collect { case v: NamedLambdaVariable => v.exprId }.toSet ==
          args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(zw: ZipWith, Literal(zero: Double, DoubleType), merge, finish)
          if zero == 0.0 && isMulOfVars(zw.function) &&
            isAddOfVars(merge) && isIdentity(finish) =>
        (floatArray(zw.left), floatArray(zw.right)) match {
          case (Some(a), Some(b)) => DotProduct(a, b)
          case _ => agg
        }
    }
}
