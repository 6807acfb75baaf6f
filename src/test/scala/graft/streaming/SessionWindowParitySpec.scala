package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Spark's built-in session_window vs the hand-rolled lag/sum
  * sessionizer, plus LTV and skew-report invariants. */
class SessionWindowParitySpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("built-in session_window reproduces the hand-rolled sessions") {
    val ev = EventStreams.events(spark, dir)
    // our sessionizer breaks strictly AFTER the gap (diff > gap keeps
    // separate, diff == gap stays together); session_window's window
    // is half-open, so gap+1µs makes the two rules identical
    val native = ev
      .groupBy(col("user_id"),
        session_window(col("ts"),
          s"${EventStreams.SessionGapMicros + 1} microseconds"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"),
        min("ts").as("session_start"))
      .select("user_id", "session_start", "n_events", "total_cents")
    val hand = EventStreams.sessionize(ev)
      .select("user_id", "session_start", "n_events", "total_cents")
    assert(native.exceptAll(hand).count() === 0L)
    assert(hand.exceptAll(native).count() === 0L)
    assert(hand.count() > 0L)
  }

  test("cohort LTV: cumulative revenue is monotone and totals add up") {
    val ev = EventStreams.events(spark, dir)
    val rows = EventStreams.cohortLtv(ev).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort")).foreach { case (_, g) =>
      val byAge = g.sortBy(_.getAs[Long]("age_weeks"))
      byAge.sliding(2).foreach { case Array(a, b) =>
        assert(b.getAs[Long]("cum_revenue_cents") >=
          a.getAs[Long]("cum_revenue_cents"))
      }
      assert(byAge.map(_.getAs[Long]("revenue_cents")).sum ===
        byAge.last.getAs[Long]("cum_revenue_cents"))
    }
    val total = rows.map(_.getAs[Long]("revenue_cents")).sum
    val expect = ev.agg(sum("cents")).first().getLong(0)
    assert(total === expect, "cohort grid must partition all revenue")
  }

  test("skew report: head is ordered, totals bound the head") {
    val rows = graft.operators.Olap.skewReport(spark, dir).collect()
    assert(rows.length === graft.operators.Olap.SkewTopK)
    val sorted = rows.sortBy(_.getAs[Long]("rank"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("cnt") >= b.getAs[Long]("cnt"))
    }
    val head = sorted.head
    assert(head.getAs[Long]("cnt") === head.getAs[Long]("max_cnt"))
    assert(head.getAs[Long]("n_rows") >=
      sorted.map(_.getAs[Long]("cnt")).sum)
  }
}
