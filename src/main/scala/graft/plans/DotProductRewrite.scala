package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite the idiomatic (but interpreted)
  * higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, e) -> acc + e)
  *
  * into the whole-stage-codegen `ArrayDotLong(a, b)` expression —
  * users writing plain declarative lambdas get the native loop for
  * free. Injected through `GraftExtensions.injectOptimizerRule`; the
  * rewrite only fires on the exact integer dot-product pattern (bigint
  * arrays, 0L seed, identity finish), and `ArrayDotLong` reproduces the
  * lambda's null semantics (NULL on unequal lengths / null elements),
  * so the substitution is bit-for-bit on every input.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private object MulLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        x.exprId == a.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
        ZipWith(a, b, mul @ MulLambda()),
        Literal(0L, LongType),
        add @ AddLambda(),
        IdentityFinish())
        if agg.resolved && mul.dataType == LongType && add.dataType == LongType =>
        ArrayDotLong(a, b)
    }
}
