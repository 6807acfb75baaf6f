package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** OLAP reporting surface: rollup, percentiles, pivot, gap fill,
  * edit-distance refinement. */
class OlapSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("rollup emits all three levels and they telescope to the grand total") {
    val out = Olap.rollupReport(spark, dir).persist()
    val grand = out.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
    val flags = out.filter(col("l_returnflag").isNotNull && col("l_linestatus").isNull)
    val leaves = out.filter(col("l_returnflag").isNotNull && col("l_linestatus").isNotNull)
    assert(grand.count() === 1L)
    val total = grand.collect().head.getLong(2)
    assert(flags.agg(sum("n")).collect().head.getLong(0) === total)
    assert(leaves.agg(sum("n")).collect().head.getLong(0) === total)
  }

  test("percentiles are ordered and drawn from the data") {
    Olap.percentiles(spark, dir).collect().foreach { r =>
      val (p50, p90, p99) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p50 <= p90 && p90 <= p99)
      assert(p50 > 0L)
    }
  }

  test("pivot preserves mass: per-user row sums equal total events") {
    val ev = EventStreams.events(spark, dir)
    val out = Olap.pivotEvents(ev)
    val rowSum = Olap.EventTypes.map(col).reduce(_ + _)
    assert(out.agg(sum(rowSum)).collect().head.getLong(0) === ev.count())
  }

  test("gap fill: contiguous hour spine per type, observed mass unchanged") {
    val ev = EventStreams.events(spark, dir)
    val out = Olap.gapFillHourly(ev).persist()
    assert(out.agg(sum("n")).collect().head.getLong(0) === ev.count())
    // spine rows per type = (max-min) hours + 1 — no holes, no dups
    val spine = out.groupBy("event_type")
      .agg(count(lit(1)).as("rows"),
        ((unix_timestamp(max("hour")) - unix_timestamp(min("hour"))) / 3600 + 1)
          .as("span"))
    assert(spine.filter(col("rows") =!= col("span")).count() === 0L)
  }

  test("editRefine scores exactly the LSH candidate pairs (prefix twins → dist 0)") {
    val cand = Dedup.minhashLsh(spark, dir).count()
    val out = Olap.editRefine(spark, dir).persist()
    assert(out.count() <= cand)
    // a near-dup variant only lost trailing tokens, so most
    // original↔variant prefixes match exactly (dist 0); the exceptions
    // are short docs whose tail loss reaches into the prefix and docs
    // whose whitespace runs normalized during token rejoin
    val twins = out.filter(col("b") === col("a") + Dedup.IdOffset).persist()
    val zero = twins.filter(col("dist") === 0L).count()
    assert(zero * 5 >= twins.count() * 4, s"only $zero/${twins.count()} at dist 0")
  }
}
