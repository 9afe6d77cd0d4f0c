package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the whole-stage-codegen'd [[graft.functions.DotProduct]].
  * Users writing the natural DataFrame form get the tight-loop
  * implementation (~50× per-element) transparently; summation order is
  * identical (left-to-right), so results are bit-equal.
  *
  * Injected by [[graft.GraftExtensions]] at session build, or at
  * runtime via `spark.experimental.extraOptimizations`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object MultiplyLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _) => true
      case _ => false
    }
  }

  private object PlusLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _) => true
      case _ => false
    }
  }

  private object IdentityLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(v2: NamedLambdaVariable), _) => v eq v2
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, MultiplyLambda()),
          Literal(0.0, DoubleType),
          PlusLambda(),
          IdentityLambda())
        if isDoubleArray(a) && isDoubleArray(b) =>
      DotProduct(a, b)
  }
}
