package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** HLL sketch, k-core peel, event transitions, JSON prop stats. */
class SketchKcoreSpec extends SparkTestBase {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("bitLen when-cascade equals java.lang.Long.bitLength over the suffix range") {
    val probe = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L,
      (1L << 23) - 1, 1L << 23, (1L << 24) - 1).toDF("x")
    val got = probe.select(col("x"), Sketch.bitLen(col("x")).as("bl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (x, bl) =>
      assert(bl === (64 - java.lang.Long.numberOfLeadingZeros(x)),
        s"bitLen($x)")
    }
  }

  test("hllDistinct estimate lands within HLL error bounds on the fact table") {
    val out = Sketch.hllOrders(spark, dir).collect().head
    val (z, est, exact) = (out.getLong(1), out.getDouble(2), out.getLong(3))
    // m=256 gives sigma ~6.5%; 4 sigma is a generous deterministic bound
    assert(math.abs(est / exact - 1.0) < 0.26, s"est=$est exact=$exact")
    // registers actually filled: Z' far below the all-empty 256*2^25
    assert(z < (256L << 25) / 4)
  }

  test("grouped HLL estimates land within error bounds for every group") {
    val rows = Sketch.hllOrdersByFlag(spark, dir).collect()
    assert(rows.length === 3) // three return flags
    rows.foreach { r =>
      val (est, exact) = (r.getAs[Double]("est"), r.getAs[Long]("exact"))
      // 256 buckets → σ ≈ 6.5%; 3σ + small-range slack
      assert(math.abs(est - exact) / exact < 0.25,
        s"grp=${r.getString(0)} est=$est exact=$exact")
    }
  }

  test("windowed distinct: linear-counting correction tracks tiny per-window cardinalities") {
    val ev = graft.streaming.EventStreams.events(spark, dir)
    val rows = graft.streaming.EventStreams.windowedDistinct(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, est, exact) =
        (r.getAs[Long]("v"), r.getAs[Double]("est"), r.getAs[Long]("exact"))
      // cardinalities here are far below 2.5m: the correction MUST fire
      // (raw HLL saturates at alpha*m ~ 185 on such windows)
      assert(v > 0 && est < 100.0, s"correction did not fire: v=$v est=$est")
      assert(math.abs(est / exact - 1.0) < 0.45, s"est=$est exact=$exact")
    }
  }

  test("count-min estimates are one-sided: est >= exact for every probed heavy hitter") {
    val rows = Sketch.cmsTopParts(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"partkey=${r.getAs[Long]("partkey")}")
    }
  }

  test("bloom probe never false-negatives and keeps fp rate in the geometry's range") {
    val r = Sketch.bloomProbe(spark, dir).head()
    val (probe, pass, truth) = (r.getAs[Long]("n_probe"),
      r.getAs[Long]("n_pass"), r.getAs[Long]("n_true"))
    assert(pass >= truth)          // every true member passes
    assert(pass <= probe)
    assert(r.getAs[Long]("n_false_pos") === pass - truth)
    assert(r.getAs[Double]("fp_rate") >= 0.0)
    assert(r.getAs[Double]("fp_rate") < 0.5) // 32K bits / 3 hashes sanity
  }

  test("CMS registers merge by addition: per-slice sketches sum to the whole-stream sketch") {
    val keys = graft.sources.Tpch.table(spark, dir, "lineitem")
      .select(col("l_partkey").as("k"))
    val whole = Sketch.cmsRegisters(keys)
    // three disjoint "days" of the stream, sketched independently
    val slices = (0 until 3).map(i =>
      Sketch.cmsRegisters(keys.filter(pmod(col("k"), lit(3L)) === i)))
    val merged = slices.reduce(_ unionAll _)
      .groupBy("d", "cell").agg(sum("cnt").as("cnt"))
    assert(whole.exceptAll(merged).count() === 0L)
    assert(merged.exceptAll(whole).count() === 0L)
  }

  test("trimmed mean sits within each group's min/max and trims both tails") {
    val rows = graft.operators.Olap.trimmedMean(spark, dir).collect()
    assert(rows.length === 5) // five o_orderpriority values
    val o = graft.sources.Tpch.table(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val bounds = o.groupBy("prio")
      .agg(count(lit(1)).as("n"), min("cents").as("mn"), max("cents").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (n, mn, mx) = bounds(r.getString(0))
      val kept = r.getAs[Long]("n_kept")
      assert(kept === n - 2 * (n / 10)) // both tails trimmed
      val mean = r.getAs[Double]("trimmed_mean_cents")
      assert(mean >= mn && mean <= mx)
    }
  }

  test("kcoreSurvivors: K4 survives the 3-core, a pendant is peeled") {
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L)) // pendant 9 hanging off the clique
      .toDF("src", "dst")
    val sym = und.unionAll(und.select(col("dst").as("src"), col("src").as("dst")))
    val kept = Iterative.kcoreSurvivors(sym, 3, 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L, 4L))
  }

  test("transitions: hand-ordered user history counts consecutive pairs") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:01"), 10L, "view"),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 00:00:02"), 10L, "click"),
      (3L, java.sql.Timestamp.valueOf("2026-01-01 00:00:03"), 10L, "view"),
      (4L, java.sql.Timestamp.valueOf("2026-01-01 00:00:01"), 20L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.streaming.EventStreams.transitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("view", "click") -> 1L, ("click", "view") -> 1L))
    // corpus identity: one transition per event beyond each user's first
    val events = graft.streaming.EventStreams.events(spark, dir)
    val total = graft.streaming.EventStreams.transitions(events)
      .agg(sum("n")).collect().head.getLong(0)
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    assert(total === nEvents - nUsers)
  }

  test("propStats parses every row's JSON and keeps per-type counts complete") {
    val events = graft.streaming.EventStreams.events(spark, dir)
    val out = graft.streaming.EventStreams.propStats(events).persist()
    assert(out.agg(sum("n")).collect().head.getLong(0) === events.count())
    // no parse failures: a null k would make sum_k null, min/max null
    assert(out.filter(col("sum_k").isNull || col("min_k") > col("max_k"))
      .count() === 0L)
  }
}
