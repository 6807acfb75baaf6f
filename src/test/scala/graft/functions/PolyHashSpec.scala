package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TextOps

/** The native codegen expression must equal the composable
  * higher-order-function form it replaced, char for char. */
class PolyHashSpec extends SparkTestBase {
  import spark.implicits._

  private val legacy =
    "aggregate(transform(split(s, ''), c -> ascii(c)), CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)"

  test("PolyHash equals the interpreted fold on corpus-like strings") {
    TextOps.ensureRegistered(spark)
    val samples = Seq("", "a", "abc", "the quick brown fox 123",
      "x" * 500, "spark join hash row batch " * 20)
    val df = samples.toDF("s")
      .withColumn("native", expr("graft_polyhash(s)"))
      .withColumn("legacy", expr(legacy))
    assert(df.filter(col("native") =!= col("legacy")).count() === 0L)
    // known value: 'abc' -> 96354 (also asserted against DuckDB)
    assert(df.filter(col("s") === "abc").head().getAs[Long]("native") === 96354L)
  }

  test("PolyHash participates in whole-stage codegen") {
    TextOps.ensureRegistered(spark)
    val plan = spark.range(100)
      .select(expr("graft_polyhash(cast(id AS STRING))").as("h"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; an expression
    // without doGenCode support would fall out of the starred project
    assert(plan.contains("*(1) Project [graft_polyhash"), plan)
  }
}
