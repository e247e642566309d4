package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (SURVEY §4, custom-surface candidate): rewrites the
  * builtin dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *     0.0d, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[graft.functions.DotProduct]] when `a` and
  * `b` are float arrays. The two are bit-identical by construction (same
  * left-to-right IEEE-754 fold, same null contract — zip_with's null
  * padding on length mismatch propagates through the sum exactly like
  * DotProduct's explicit length check), so this is a pure physical win:
  * higher-order lambdas run interpreted per element; DotProduct is one
  * primitive loop inside WholeStageCodegen.
  *
  * Users writing plain SQL against the engine (via
  * `spark.sql.extensions=graft.functions.GraftExtensions`) get the fast
  * path without knowing graft_dot exists. Conservative on purpose: only
  * the exact shape above fires — any other lambda body, seed, or merge
  * function is left untouched.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** `CAST(x AS DOUBLE) * CAST(y AS DOUBLE)` over the two lambda vars. */
  private def isCastMultiply(body: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = body match {
    case Multiply(Cast(lx: NamedLambdaVariable, DoubleType, _, _),
        Cast(ly: NamedLambdaVariable, DoubleType, _, _), _) =>
      lx.exprId == x.exprId && ly.exprId == y.exprId
    case _ => false
  }

  /** `acc + v` over the two lambda vars (either order). */
  private def isAccumulate(body: Expression, acc: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = body match {
    case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
      (l.exprId == acc.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == acc.exprId)
    case _ => false
  }

  private def zeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0, _), DoubleType, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern
        .HIGH_ORDER_FUNCTION)) {
      case agg @ ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mulBody, Seq(x: NamedLambdaVariable,
              y: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(addBody, Seq(acc: NamedLambdaVariable,
            v: NamedLambdaVariable), _),
          LambdaFunction(finishBody: NamedLambdaVariable, Seq(fin), _))
          if isFloatArray(a) && isFloatArray(b) && zeroDouble(zero) &&
            isCastMultiply(mulBody, x, y) && isAccumulate(addBody, acc, v) &&
            finishBody.exprId == fin.exprId =>
        DotProduct(a, b)
    }
}
