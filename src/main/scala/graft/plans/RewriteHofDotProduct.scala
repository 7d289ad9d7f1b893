package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.DotProduct

/** Optimizer rule: rewrite the higher-order-function dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[graft.functions.DotProduct]] expression.
  *
  * Spark evaluates HOF lambdas on the interpreted path (measured 36×
  * slower than the native loop on the sf0.1 pair scan) but the idiom is
  * what users naturally write; this rule gives them the native kernel
  * transparently — the SURVEY.md §7.3(c) custom-`Rule[LogicalPlan]`
  * surface. Arithmetic is preserved exactly: both forms widen to double
  * per element and fold left-to-right.
  *
  * Register per session via `spark.experimental.extraOptimizations` or
  * globally with `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  /** The lambda variable itself, possibly widened to double. */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if isNumericArray(a) && isNumericArray(b) &&
            ((isVar(mx, x) && isVar(my, y)) || (isVar(mx, y) && isVar(my, x))) &&
            ((isVar(al, acc) && isVar(ar, el)) || (isVar(al, el) && isVar(ar, acc))) &&
            fin.exprId == fv.exprId =>
        DotProduct(a, b)
    }
}

/** `spark.sql.extensions` entry point injecting the graft optimizer
  * rules into every session built with this config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
}
