package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** MIS independence, hard-negative labels, class-balance caps, and
  * lateness bucket accounting. */
class MisHardNegLateSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("mis: selected set is independent (no edge inside the set)") {
    val (mis, active, edges) = Iterative.misSets(spark, dir)
    val m = mis.select(col("node"))
    val inside = edges
      .join(m.select(col("node").as("src")), "src")
      .join(m.select(col("node").as("dst")), "dst")
      .count()
    assert(inside === 0L, s"$inside edges connect two MIS nodes")
    // decided + undecided partition progress: mis grows, active shrinks
    assert(mis.count() > 0L)
    // every undecided node must still have an undecided neighbor
    // (otherwise it would have been selected as isolated-in-active)
    val a = active.select(col("node"))
    val lonely = a.join(
      edges.join(a.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct(),
      Seq("node"), "left_anti").count()
    assert(lonely === 0L, s"$lonely undecided nodes have no active neighbor")
    ()
  }

  test("hard negatives: every row crosses labels, ranks dense per query") {
    val rows = Similarity.hardNegatives(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("q_label") !== r.getAs[Int]("n_label"))
      assert(r.getAs[Double]("cos") <= 1.000001)
    }
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq ===
        (1 to g.length).toSeq)
    }
  }

  test("class balance: cap respected, kept counts never exceed totals") {
    val rows = Pipeline.balanceClasses(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, k) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      assert(k === math.min(t, Pipeline.BalanceCap))
      assert(r.getAs[Long]("kept_sum") < Pipeline.BalanceP)
    }
  }

  test("lateness: buckets partition the stream, bounds hold") {
    val ev = EventStreams.events(spark, dir)
    val rows = EventStreams.lateness(ev).collect()
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total === ev.count())
    val bound = Map("a_on_time" -> 0L, "b_lt_1m" -> 60000000L,
      "c_lt_1h" -> 3600000000L, "d_lt_6h" -> 21600000000L,
      "e_ge_6h" -> Long.MaxValue)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_late_us") <= bound(r.getAs[String]("bucket")))
    }
  }
}
