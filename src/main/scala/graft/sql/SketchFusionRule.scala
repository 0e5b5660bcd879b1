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

  private object MultiplyOfVars {
    def unapply(e: Expression): Boolean = e match {
      case Multiply(l, r, _) =>
        def isVarOrCastVar(x: Expression): Boolean = x match {
          case _: NamedLambdaVariable => true
          case Cast(_: NamedLambdaVariable, DoubleType, _, _) => true
          case _ => false
        }
        isVarOrCastVar(l) && isVarOrCastVar(r)
      case _ => false
    }
  }

  private object AddOfVars {
    def unapply(e: Expression): Boolean = e match {
      case Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _) => true
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(left, right, LambdaFunction(mulBody, _, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(addBody, _, _),
          LambdaFunction(finish: NamedLambdaVariable, _, _)
        )
        if MultiplyOfVars.unapply(mulBody) && AddOfVars.unapply(addBody) &&
          isFloatOrDoubleArray(left) && isFloatOrDoubleArray(right) =>
      DotProduct(left, right)
  }
}
