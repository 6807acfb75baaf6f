package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** Funnel, anomaly gate, histogram, co-purchase projection. */
class AnalyticsOpsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("funnel stages are monotone and bounded by the user census") {
    val ev = EventStreams.events(spark, dir)
    val r = EventStreams.funnel(ev).collect().head
    val (users, viewed, clicked, purchased) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users >= viewed && viewed >= clicked && clicked >= purchased)
    assert(purchased >= 0L && users === ev.select("user_id").distinct().count())
  }

  test("anomaly gate: outliers are a strict minority and medians sit in range") {
    val ev = EventStreams.events(spark, dir)
    val out = Olap.anomalies(ev).persist()
    assert(out.filter(col("n_outliers") * 2 > col("n")).count() === 0L)
    val bounds = ev.groupBy("event_type")
      .agg(min("cents").as("lo"), max("cents").as("hi"))
    assert(out.join(bounds, "event_type")
      .filter(col("med_cents") < col("lo") || col("med_cents") > col("hi"))
      .count() === 0L)
  }

  test("histogram: buckets in range, mass conserved, bounds ordered") {
    val out = Olap.histogram(spark, dir).persist()
    val nOrders = graft.sources.Tpch.table(spark, dir, "orders").count()
    assert(out.agg(sum("n")).collect().head.getLong(0) === nOrders)
    assert(out.filter(col("bucket") < 0 ||
      col("bucket") >= Olap.HistBuckets).count() === 0L)
    assert(out.filter(col("lo_cents") > col("hi_cents")).count() === 0L)
    // bucket ranges must not overlap when ordered by bucket id
    val rows = out.orderBy("bucket").collect()
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2))
      case _ =>
    }
  }

  test("co-purchase pairs are canonical, weighted, and deterministically ranked") {
    val out = GraphOps.copurchaseTop(spark, dir).collect()
    assert(out.nonEmpty && out.length <= GraphOps.CopurchaseTopK)
    out.foreach(r => assert(r.getLong(0) < r.getLong(1) && r.getLong(2) >= 1L))
    // weights non-increasing in output order
    out.map(_.getLong(2)).sliding(2).foreach {
      case Array(x, y) => assert(x >= y)
      case _ =>
    }
  }
}
