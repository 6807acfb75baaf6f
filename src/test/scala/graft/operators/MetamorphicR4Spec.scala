package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** Partition-invariance metamorphics and empty-input robustness for the
  * round-4 operators: results must not depend on physical layout, and
  * empty inputs must yield empty (not crashing) outputs — both are
  * what "would still work on a 1000-executor cluster" means in specs. */
class MetamorphicR4Spec extends SparkTestBase {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def same(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  test("transitions and percentiles are partition-invariant") {
    val ev = EventStreams.events(spark, dir)
    same(EventStreams.transitions(ev),
      EventStreams.transitions(ev.repartition(7, col("event_type"))))
    same(Olap.percentiles(spark, dir),
      Olap.percentiles(spark, dir)) // second plan re-derives from scan
  }

  test("pivot and retention are partition-invariant") {
    val ev = EventStreams.events(spark, dir)
    same(Olap.pivotEvents(ev), Olap.pivotEvents(ev.repartition(5)))
    same(EventStreams.retention(ev), EventStreams.retention(ev.repartition(3)))
  }

  test("hllDistinct is layout- and duplication-invariant") {
    val keys = graft.sources.Tpch.table(spark, dir, "lineitem")
      .select(col("l_orderkey"))
    val base = Sketch.hllDistinct(keys, "l_orderkey")
    // registers are max-merged: re-partitioning AND duplicating rows
    // must not move the estimate (a distinct-sketch property)
    same(base, Sketch.hllDistinct(keys.repartition(9), "l_orderkey"))
    same(base.drop("exact"),
      Sketch.hllDistinct(keys.unionAll(keys), "l_orderkey").drop("exact"))
  }

  test("empty inputs flow through: transitions, pivot, retention, gap fill") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("user_id", "ts", "event_id", "event_type", "value", "props")
    assert(EventStreams.transitions(empty).count() === 0L)
    assert(Olap.pivotEvents(empty).count() === 0L)
    assert(EventStreams.retention(empty).count() === 0L)
    assert(Olap.gapFillHourly(empty).count() === 0L)
  }

  test("kcoreSurvivors and triangleStats on empty edge sets are empty, not errors") {
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Iterative.kcoreSurvivors(noEdges, 3, 2).count() === 0L)
    val r = GraphOps.triangleStats(noEdges.toDF("x", "y")).collect().head
    assert(r.isNullAt(0) || r.getLong(0) === 0L) // sum over zero rows is null
  }
}
