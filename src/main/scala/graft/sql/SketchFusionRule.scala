package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.expressions.DotProduct

/**
 * Optimizer rule: recognize the composable dot-product fold —
 * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
 * (acc, v) -> acc + v)` — and fuse it into the native [[DotProduct]]
 * expression (same sequential-sum IEEE semantics, one tight loop,
 * no interpreted lambda evaluation).
 *
 * This is the (c)-tier extension point from the design notes: a
 * `Rule[LogicalPlan]` injected through SparkSessionExtensions
 * (graft.sql.GraftExtensions), so users who write the portable
 * functions-API formulation get the native kernel automatically.
 */
object SketchFusionRule extends Rule[LogicalPlan] {

  // Safe for nullable arrays: DotProduct mirrors the fold's null semantics
  // exactly (NULL on length mismatch — zip_with's padding — and NULL when
  // any element is null — the fold's acc + NULL).
  private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** `body` is `x * y` (modulo double casts) where x and y are EXACTLY
    * the two given lambda arguments, one each, in either order —
    * `x * x` (a sum of squares) or a captured outer variable must NOT
    * match: rewriting those to DotProduct(a, b) would be silently
    * wrong, the worst failure mode an optimizer rule can have. */
  private def isCrossMultiply(body: Expression, args: Seq[NamedLambdaVariable]): Boolean =
    body match {
      case Multiply(l, r, _) =>
        def asVar(x: Expression): Option[NamedLambdaVariable] = x match {
          case v: NamedLambdaVariable => Some(v)
          case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
          case _ => None
        }
        (asVar(l), asVar(r)) match {
          case (Some(a), Some(b)) if args.length == 2 =>
            // identity (exprId), not name equality: shadowed/renamed
            // variables with equal names must not fool the matcher
            val Seq(x, y) = args
            (a.exprId == x.exprId && b.exprId == y.exprId) ||
              (a.exprId == y.exprId && b.exprId == x.exprId)
          case _ => false
        }
      case _ => false
    }

  /** `body` is `acc + v` with acc and v exactly the fold lambda's two
    * distinct arguments (either order — addition commutes). */
  private def isAccPlusVar(body: Expression, args: Seq[NamedLambdaVariable]): Boolean =
    body match {
      case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) if args.length == 2 =>
        val Seq(acc, v) = args
        (l.exprId == acc.exprId && r.exprId == v.exprId) ||
          (l.exprId == v.exprId && r.exprId == acc.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(left, right, LambdaFunction(mulBody, mulArgs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(addBody, addArgs, _),
          LambdaFunction(finish: NamedLambdaVariable, finishArgs, _)
        )
        if isCrossMultiply(mulBody, mulArgs.collect { case v: NamedLambdaVariable => v }) &&
          isAccPlusVar(addBody, addArgs.collect { case v: NamedLambdaVariable => v }) &&
          finishArgs.exists { case v: NamedLambdaVariable => v.exprId == finish.exprId; case _ => false } &&
          isFloatOrDoubleArray(left) && isFloatOrDoubleArray(right) =>
      DotProduct(left, right)
  }
}
