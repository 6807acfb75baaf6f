package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit}

/** Phase-split cold profiler for `dd_stream_batch` — the suite's
  * noisiest cold line (r12: 78.5-288.9 exec-s across four same-code
  * runs; VERDICT r12 Next #3). Replicates the bench cold pass's
  * environment (warm() input layer, SessionMemo.coldMode, orphan
  * drain after each round), then rebuilds the query N times with the
  * build split into its phases:
  *
  *   postings  — rawPostings(nearCorpus) persisted + counted (the
  *               1M-posting index rebuild: shingling + explode)
  *   df_agg    — the df sidecar aggregation over the persisted index
  *   probe     — batchPairs (delta postings, cap joins, candidate
  *               gen, exact-Jaccard verify) persisted + counted
  *
  * A constant calibration kernel (same as Bench's) runs between
  * rounds so box weather is separable from a jumpy phase. One line
  * per phase: `[sbprof] round R phase P wall Ws exec Xs rows N`.
  */
object StreamBatchProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val execMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) { execMs.addAndGet(m.executorRunTime); () }
        }
      })
    def drainBus(): Unit = try {
      val bus = spark.sparkContext.getClass.getMethod("listenerBus")
        .invoke(spark.sparkContext)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .map(_.invoke(bus)).getOrElse(Thread.sleep(200))
      ()
    } catch { case _: Throwable => Thread.sleep(200) }
    def phase(round: Int, name: String)(body: => Long): Unit = {
      drainBus()
      val e0 = execMs.get()
      val t0 = System.nanoTime()
      val n = body
      drainBus()
      println(f"[sbprof] round $round phase $name%-9s wall ${(System.nanoTime() - t0) / 1e9}%7.2fs exec ${(execMs.get() - e0) / 1e3}%7.1fs rows $n")
    }
    def kernel(tag: String): Unit = phase(0, s"kernel_$tag") {
      spark.range(0L, 50000000L, 1L, 32)
        .selectExpr("id % 997 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"),
          count(lit(1))).count()
    }
    import graft.operators.{Dedup, DedupStream, TextOps}
    TextOps.ensureRegistered(spark)
    val w0 = System.nanoTime()
    SparkEntry.warm(spark, sfDir)
    println(f"[sbprof] warm ${(System.nanoTime() - w0) / 1e9}%.1fs")
    kernel("warmed")
    kernel("warmed") // first kernel pays codegen; trust the second
    // drop the memoized result's cache exactly like the bench cold
    // path does — otherwise round 1 plan-aliases the warm entry and
    // reads exec 0.0 (observed on this harness's first campaign)
    Dedup.streamBatchPairs(spark, sfDir).unpersist(false)
    SessionMemo.coldMode = true
    for (r <- 1 to rounds) {
      var bp: org.apache.spark.sql.DataFrame = null
      phase(r, "postings") {
        bp = Dedup.rawPostings(Dedup.nearCorpus(spark, sfDir)).persist()
        bp.count()
      }
      val baseDf = bp.groupBy("sfp").agg(count(lit(1)).as("df")).persist()
      phase(r, "df_agg") { baseDf.count() }
      var capped: org.apache.spark.sql.DataFrame = null
      phase(r, "cap_join") {
        capped = bp.join(
          baseDf.filter(col("df") <= Dedup.MaxDf).select("sfp"), "sfp").persist()
        capped.count()
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      phase(r, "probe") {
        pairs = DedupStream.batchPairs(capped, baseDf,
          Dedup.deltaCorpus(spark, sfDir)).persist()
        pairs.count()
      }
      // sub-phase split of the probe (GRAFT_SB_SUBPHASES=1): replicate
      // batchPairs' internal steps one materialization at a time so the
      // 100+ exec-s "probe/verify fan-out" attributes to a STEP, not a
      // phase — candidate generation vs exact verify vs size sidecar.
      if (sys.env.contains("GRAFT_SB_SUBPHASES")) {
        val delta = Dedup.deltaCorpus(spark, sfDir)
        val dp = Dedup.rawPostings(delta).persist()
        phase(r, "sp_delta") { dp.count() }
        val dfDelta = dp.groupBy("sfp").agg(count(lit(1)).as("dfd"))
        val baseDfAtDelta = baseDf.join(
          org.apache.spark.sql.functions.broadcast(dfDelta.select("sfp")), "sfp")
        val dfU = dfDelta
          .join(org.apache.spark.sql.functions.broadcast(baseDfAtDelta),
            Seq("sfp"), "left")
          .select(col("sfp"), col("dfd"),
            org.apache.spark.sql.functions.coalesce(col("df"), lit(0L)).as("dfb"))
          .persist()
        phase(r, "sp_dfu") { dfU.count() }
        val keep = dfU.filter(col("dfd") + col("dfb") <= graft.operators.Dedup.MaxDf)
          .select("sfp")
        val overCap = dfU.filter(col("dfb") <= graft.operators.Dedup.MaxDf &&
          col("dfd") + col("dfb") > graft.operators.Dedup.MaxDf).select("sfp")
        val probeP = dp.join(
          org.apache.spark.sql.functions.broadcast(keep), "sfp").persist()
        phase(r, "sp_probe_set") { probeP.count() }
        val cappedU = capped
          .join(org.apache.spark.sql.functions.broadcast(overCap),
            Seq("sfp"), "left_anti")
          .unionAll(probeP).persist()
        phase(r, "sp_capped") { cappedU.count() }
        // collision-count verify (the r14 shape): the candidate join
        // IS the intersection enumeration — one partial-agg groupBy
        // replaces the former distinct + two-sided posting re-join
        // (which this profiler measured at cand 14.6 + inter 73.4
        // exec-s of the probe's ~107 before the rewrite)
        val inter = org.apache.spark.sql.functions.broadcast(
            probeP.select(col("doc_id").as("x"), col("sfp")))
          .join(capped
              .join(org.apache.spark.sql.functions.broadcast(overCap),
                Seq("sfp"), "left_anti")
              .select(col("doc_id").as("y"), col("sfp"), lit(false).as("is_d"))
            .unionAll(probeP.select(col("doc_id").as("y"), col("sfp"),
              lit(true).as("is_d"))), "sfp")
          .filter(col("x") =!= col("y") && (!col("is_d") || col("x") < col("y")))
          .groupBy(org.apache.spark.sql.functions.least(col("x"), col("y")).as("a"),
            org.apache.spark.sql.functions.greatest(col("x"), col("y")).as("b"))
          .agg(count(lit(1)).as("inter")).persist()
        phase(r, "sp_collision") { inter.count() }
        val sizes = cappedU.groupBy("doc_id").agg(count(lit(1)).as("nsh")).persist()
        phase(r, "sp_sizes") { sizes.count() }
        val scored = inter
          .join(sizes.select(col("doc_id").as("a"), col("nsh").as("na")), "a")
          .join(sizes.select(col("doc_id").as("b"), col("nsh").as("nb")), "b")
          .withColumn("jacc", col("inter") / (col("na") + col("nb") - col("inter")))
          .filter(col("jacc") >= graft.operators.Dedup.Tau)
        phase(r, "sp_score") { scored.count() }
        Seq(dp, dfU, probeP, cappedU, inter, sizes).foreach(_.unpersist())
      }
      bp.unpersist(); baseDf.unpersist(); capped.unpersist()
      pairs.unpersist()
      DedupStream.drainBatchHandles()
      SessionMemo.drainColdOrphans()
      kernel(s"round$r")
    }
    SessionMemo.coldMode = false
    spark.stop()
  }
}
