package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Expression, ExpressionInfo, LambdaFunction, Literal,
  Multiply, NamedExpression, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.{DotProduct, PolyHash}

/** Optimizer rule: rewrite the composable integer-dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the native codegen expression [[DotProduct]] (`graft_dot`).
  * The HOF form is interpreted per element and allocates the zipped
  * intermediate array; the rewrite makes any user query written in the
  * portable form run at native speed — the "let Catalyst optimize"
  * principle applied to the engine's own extension. Safe for ANY
  * ARRAY<BIGINT> inputs: DotProduct models the HOF semantics exactly,
  * including the null-poisoning cases (unequal lengths — zip_with pads
  * with nulls — and null elements both yield NULL), so an injected
  * rule never silently alters user-visible results.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** the lambda is `(p, q) -> p OP q` over exactly its own two params */
  private def isBinOpOfArgs(fn: LambdaFunction,
      matchOp: PartialFunction[Expression, (Expression, Expression)]): Boolean =
    fn match {
      case LambdaFunction(body, Seq(a: NamedExpression, b: NamedExpression), _)
          if matchOp.isDefinedAt(body) =>
        val (l, r) = matchOp(body)
        (l, r) match {
          case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
            Set(lv.exprId, rv.exprId) == Set(a.exprId, b.exprId)
          case _ => false
        }
      case _ => false
    }

  private def isIdentity(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedExpression), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right, mul: LambdaFunction),
            Literal(0L, LongType),
            merge: LambdaFunction,
            finish: LambdaFunction)
          if isLongArray(left) && isLongArray(right) &&
            isBinOpOfArgs(mul, { case Multiply(x, y, _) => (x, y) }) &&
            isBinOpOfArgs(merge, { case Add(x, y, _) => (x, y) }) &&
            isIdentity(finish) =>
        DotProduct(left, right)
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`): registers the
  * engine's native functions and the dot-product rewrite on every
  * session — the SparkSessionExtensions packaging of what
  * [[graft.functions.GraftFunctions.register]] does imperatively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => DotProductRewrite)
  }
}
