package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TextOps

/** The native dot-product expression must equal the interpreted
  * aggregate(zip_with(...)) form it replaced, element for element. */
class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  private val legacy =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)"

  test("DotProduct equals the interpreted HOF form") {
    TextOps.ensureRegistered(spark)
    val samples = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(-7L, 1000L), Seq(3L, -2L)),
      ((1L to 64L).toSeq, (64L to 1L by -1L).toSeq))
    val df = samples.toDF("a", "b")
      .withColumn("native", expr("graft_dot(a, b)"))
      .withColumn("legacy", expr(legacy))
    assert(df.filter(col("native") =!= col("legacy")).count() === 0L)
    assert(df.filter(size(col("a")) === 3).head().getAs[Long]("native") === 32L)
  }

  test("DotProduct participates in whole-stage codegen") {
    TextOps.ensureRegistered(spark)
    val plan = spark.range(100)
      .select(expr("graft_dot(array(id, id), array(2L, 3L))").as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), plan)
  }

  test("null array yields null, mismatched lengths use the shorter") {
    TextOps.ensureRegistered(spark)
    val df = Seq((Some(Seq(1L, 2L)), Seq(10L, 20L, 30L)), (None, Seq(1L)))
      .toDF("a", "b")
      .withColumn("d", expr("graft_dot(a, b)"))
    val rows = df.orderBy(col("a").asc_nulls_first).collect()
    assert(rows(0).isNullAt(2))
    assert(rows(1).getLong(2) === 50L)
  }
}
