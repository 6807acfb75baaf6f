package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** Invariants of the round-5 additions: product-quantization ANN,
  * int8 quantization error accounting, and last-touch attribution. */
class PqInt8AttributionSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("annPq: K results per query, cos bounded, codebook side broadcast") {
    val rows = Similarity.annPq(spark, dir).collect()
    assert(rows.nonEmpty)
    val perQuery = rows.groupBy(_.getAs[Long]("qid"))
    perQuery.foreach { case (qid, rs) =>
      assert(rs.length === Similarity.K, s"query $qid has ${rs.length} rows")
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to Similarity.K),
        s"ranks not dense for $qid")
      rs.foreach { r =>
        assert(r.getAs[Long]("nid") !== qid)
        // ADC cos is approximate but still a cosine of two real vectors
        // (query × reconstruction) — Cauchy-Schwarz bounds it
        assert(math.abs(r.getAs[Double]("cos")) <= 1.000001)
      }
    }
    // scale shape: the corpus is never joined against itself — every
    // join partner (codebook, LUT) is broadcast
    val p = Similarity.annPq(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  test("annPq recall vs brute force is positive (codes carry signal)") {
    val recall = Similarity.annRecall(spark, dir)
      .filter(col("variant") === "pq").select("recall")
      .head().getDouble(0)
    assert(recall > 0.0 && recall <= 1.0, s"pq recall $recall")
  }

  test("int8Quantize: codes bounded, error at most half a step") {
    val rows = Similarity.int8Quantize(spark, dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val amax = r.getAs[Long]("amax")
      val maxErr = r.getAs[Long]("max_err255")
      val nCodes = r.getAs[Long]("n_codes")
      assert(amax > 0)
      // round-to-nearest: |255·(x+amax) − code·2amax| ≤ amax
      assert(maxErr <= amax, s"dim ${r.getAs[Long]("dim")}: err $maxErr > amax $amax")
      assert(nCodes >= 1 && nCodes <= 256)
    }
  }

  test("attribution conserves purchase revenue and counts") {
    val ev = EventStreams.events(spark, dir)
    val attr = EventStreams.attribution(ev)
    val attributed = attr.agg(sum("cents_total"), sum("n_purchases"))
      .head()
    val purchases = ev.filter(col("event_type") === "purchase")
      .agg(sum("cents"), count(lit(1))).head()
    assert(attributed.getLong(0) === purchases.getLong(0),
      "attributed cents != purchase cents")
    assert(attributed.getLong(1) === purchases.getLong(1),
      "attributed purchase count mismatch")
    // channels are touch types or 'direct', never 'purchase'
    val channels = attr.select("channel").collect().map(_.getString(0))
    assert(!channels.contains("purchase"))
  }
}
