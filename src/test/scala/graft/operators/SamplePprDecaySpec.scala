package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** Personalized PageRank, hash-sample quantiles, and time-decay
  * scoring: mass/order invariants and error bounds. */
class SamplePprDecaySpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("ppr: restart mass stays near the seed set") {
    val ppr = PageRank.personalized(spark, dir).collect()
    assert(ppr.length === PageRank.TopK)
    val ranks = ppr.map(_.getAs[Long]("pr"))
    assert(ranks.forall(_ >= 0L))
    // ordered by pr desc then node
    ranks.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    // seeds are suppliers: their out-edges point at nations, so mass
    // concentrates on nation/region nodes — the global top-1 must be
    // one of the 25+5 geography ids (kind prefix 1 or 2 × 1e12)
    val topNode = ppr.head.getAs[Long]("node")
    assert(topNode < 3L * 1000000000000L, s"top node $topNode not geography")
  }

  test("ppr differs from global pagerank (the seed restriction bites)") {
    val global = PageRank.topRanks(spark, dir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    val ppr = PageRank.personalized(spark, dir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(global !== ppr)
    // personalized total mass is strictly below global (fewer sources)
    assert(ppr.values.sum < global.values.sum)
  }

  test("sample quantiles: ordered picks, ~1/16 rate, p50 near exact") {
    val rows = Sketch.sampleQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, ns) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_sample"))
      // binomial(n, 1/16): allow ±50% at sf0.001 group sizes
      assert(ns > nt / 32 && ns < nt / 8, s"sample rate off: $ns of $nt")
      val qs = Seq("p25_cents", "p50_cents", "p90_cents", "p99_cents")
        .map(r.getAs[Long])
      qs.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
      // rank error ~ √(q(1−q)/n_sample) ≈ 4% of rank at n=130; on a
      // near-uniform value distribution that is up to ~2× in value
      // terms — 20% headroom keeps the probe meaningful without
      // flaking on sf0.001's tiny groups
      val exact = r.getAs[Long]("exact_p50_cents").toDouble
      assert(math.abs(r.getAs[Long]("p50_cents") - exact) / exact < 0.20,
        s"sampled p50 drifted >20% from exact: $r")
    }
  }

  test("decay score: shifts only shrink, never inflate") {
    val ev = EventStreams.events(spark, "/root/testdata/sf0.001")
    val rows = EventStreams.decayScore(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("decayed_cents") <= r.getAs[Long]("raw_cents"))
      assert(r.getAs[Long]("decayed_cents") >= 0L)
    }
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total === ev.count())
  }

  test("decay score: merging two shards equals scoring the union") {
    val ev = EventStreams.events(spark, "/root/testdata/sf0.001")
    // split by a key hash; both halves share the union's anchor hour,
    // so per-shard scoring + addition must equal the one-pass score
    val anchor = ev.agg(max(expr("unix_micros(ts) div 3600000000"))).first().getLong(0)
    def scored(df: org.apache.spark.sql.DataFrame) = {
      // re-anchor each shard to the union's max hour by appending a
      // zero-value sentinel event at the anchor hour
      val sentinel = ev.sparkSession.sql(
        s"SELECT 'x' AS event_type, CAST(0 AS BIGINT) AS cents, " +
          s"timestamp_micros($anchor * 3600000000) AS ts")
      EventStreams.decayScore(df.select("event_type", "cents", "ts")
          .unionByName(sentinel))
        .filter(col("event_type") =!= "x")
        .collect().map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("decayed_cents"))).toMap
    }
    val a = scored(ev.filter(pmod(col("user_id"), lit(2)) === 0))
    val b = scored(ev.filter(pmod(col("user_id"), lit(2)) === 1))
    val whole = scored(ev)
    whole.foreach { case (t, (n, d)) =>
      val (na, da) = a.getOrElse(t, (0L, 0L))
      val (nb, db) = b.getOrElse(t, (0L, 0L))
      assert(na + nb === n, s"event counts don't merge for $t")
      assert(da + db === d, s"decayed sums don't merge for $t")
    }
  }
}
