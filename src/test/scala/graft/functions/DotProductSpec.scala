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

  test("null array, length mismatch and null elements all yield null — like the HOF") {
    TextOps.ensureRegistered(spark)
    // all three null-poisoning cases must agree with the interpreted
    // fold, or the optimizer rewrite would change user-visible results
    val df = Seq(
      (Some(Seq[Option[Long]](Some(1L), Some(2L))),
        Seq[Option[Long]](Some(10L), Some(20L), Some(30L))),   // length mismatch
      (None, Seq[Option[Long]](Some(1L))),                     // null array
      (Some(Seq[Option[Long]](Some(1L), None)),
        Seq[Option[Long]](Some(5L), Some(6L))),                // null element
      (Some(Seq[Option[Long]](Some(2L), Some(3L))),
        Seq[Option[Long]](Some(5L), Some(6L))))                // clean: 28
      .toDF("a", "b")
      .withColumn("native", expr("graft_dot(a, b)"))
      .withColumn("legacy", expr(legacy))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.isNullAt(2) === r.isNullAt(3), r.toString)
      if (!r.isNullAt(2)) assert(r.getLong(2) === r.getLong(3), r.toString)
    }
    assert(rows.count(_.isNullAt(2)) === 3)
    assert(rows.filter(!_.isNullAt(2)).map(_.getLong(2)).toSeq === Seq(28L))
  }
}
