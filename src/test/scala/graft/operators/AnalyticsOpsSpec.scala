package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** Funnel, anomaly gate, histogram, co-purchase projection. */
class AnalyticsOpsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("trending: at most k rows per window, dense ranks, counts non-increasing") {
    val t = EventStreams.trending(EventStreams.events(spark, dir)).persist()
    assert(t.count() > 0)
    val byWin = t.groupBy("win").agg(
      count(lit(1)).as("rows"), max("rnk").as("mx"), min("rnk").as("mn"))
    assert(byWin.filter(col("rows") > EventStreams.TrendingK).count() === 0L)
    assert(byWin.filter(col("mn") =!= 1L || col("mx") =!= col("rows")).count() === 0L)
    // rank order respects count order within a window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("win").orderBy("rnk")
    assert(t.withColumn("prev_n", lag("n", 1).over(w))
      .filter(col("prev_n").isNotNull && col("n") > col("prev_n"))
      .count() === 0L)
    t.unpersist()
    ()
  }

  test("supplier similarity pairs are canonical, bounded, and truly overlapping") {
    import graft.operators.GraphOps
    val simRows = GraphOps.supplierSimilarity(spark, dir).collect()
    assert(simRows.nonEmpty && simRows.length <= GraphOps.SimTopK)
    simRows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= GraphOps.SimTau && j <= 1.0)
    }
    // descending by (jacc, a, b)
    val ord = simRows.map(r => (-r.getDouble(2), r.getLong(0), r.getLong(1)))
    assert(ord.sameElements(ord.sorted))
  }

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
