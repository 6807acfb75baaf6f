package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The dot-product rewrite must fire on the portable HOF idiom and
  * change nothing else — verified on the live session via
  * experimental.extraOptimizations (the same Rule object the
  * SparkSessionExtensions entry point injects). */
class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
  }

  test("HOF dot-product idiom is rewritten to graft_dot and results agree") {
    // range-based source: literal inputs would constant-fold into a
    // LocalTableScan and hide the rewrite from the plan
    val df = spark.range(2).select(
      expr("transform(sequence(1L, 8L), k -> k + id)").as("a"),
      expr("transform(sequence(1L, 8L), k -> k * 2)").as("b"))
      .select(expr(hofDot).as("d"))
    val (plan, rows) = withRule {
      (df.queryExecution.executedPlan.toString,
        df.orderBy("d").collect().map(_.getLong(0)))
    }
    assert(plan.contains("graft_dot"), plan)
    assert(!plan.contains("aggregate("), plan)
    // dot = Σ_{k=1..8} (k+id)·2k = 2·204 + 72·id
    assert(rows.toSeq === Seq(408L, 480L))
  }

  test("rewrite leaves non-matching folds alone") {
    // max-fold, not a dot product — must stay an ArrayAggregate
    val df = Seq((Seq(1L, 9L, 3L), Seq(2L, 2L, 2L))).toDF("a", "b")
      .select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> greatest(acc, v))").as("m"))
    val (plan, out) = withRule {
      (df.queryExecution.executedPlan.toString, df.head().getLong(0))
    }
    assert(!plan.contains("graft_dot"), plan)
    assert(out === 18L)
  }

  test("GraftExtensions injects both functions and the rule") {
    var functions = 0
    var rules = 0
    val probe = new SparkSessionExtensions {
      override def injectFunction(fd: FunctionDescription): Unit = functions += 1
      override def injectOptimizerRule(
          b: RuleBuilder): Unit = rules += 1
    }
    new GraftExtensions().apply(probe)
    assert(functions === 2)
    assert(rules === 1)
  }
}
