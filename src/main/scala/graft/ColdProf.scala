package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit}

/** Isolated warm/cold profiler for NAMED queries — the generalized
  * form of [[StreamBatchProf]]'s method, for attributing in-suite
  * movers (VERDICT r13 Next #1/#5): replicate the bench environment
  * (`SparkEntry.warm` input layer, noop sink, listener-bus-drained
  * exec windows, constant calibration kernel between phases), then
  * for each named query print
  *
  *   - `warm`: N timed steady-state touches (memo reads for memoized
  *     queries — what the suite's warm median measures), then
  *   - `cold`: N timed rebuilds under `SessionMemo.coldMode` with the
  *     orphan drain after each (what the honest-cold pass measures),
  *
  * with a kernel reading after each query so box weather is separable
  * from a genuinely jumpy query. Usage:
  * `runMain graft.ColdProf [rounds] <query> [query ...]`. */
object ColdProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (rounds, names) = args.headOption.flatMap(_.toIntOption) match {
      case Some(r) => (r, args.drop(1).toSeq)
      case None => (3, args.toSeq)
    }
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
    // shuffle write bytes per window: §2.3's "shuffle fewer bytes" is
    // the claim layout changes make — exec seconds alone cannot verify
    // it at sf scale where CPU and job overhead dominate the wall
    val shufB = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            execMs.addAndGet(m.executorRunTime)
            shufB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ()
          }
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
    def timed(tag: String)(body: => Unit): Unit = {
      drainBus()
      val e0 = execMs.get()
      val s0 = shufB.get()
      val t0 = System.nanoTime()
      body
      drainBus()
      println(f"[coldprof] $tag wall ${(System.nanoTime() - t0) / 1e9}%7.2fs " +
        f"exec ${(execMs.get() - e0) / 1e3}%7.1fs " +
        f"shufMB ${(shufB.get() - s0) / 1048576.0}%8.1f")
    }
    def kernel(tag: String): Unit = timed(s"kernel $tag") {
      spark.range(0L, 50000000L, 1L, 32)
        .selectExpr("id % 997 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"),
          count(lit(1))).count()
      ()
    }
    val w0 = System.nanoTime()
    SparkEntry.warm(spark, sfDir)
    println(f"[coldprof] warm ${(System.nanoTime() - w0) / 1e9}%.1fs")
    kernel("warmed")
    kernel("warmed") // first kernel pays codegen; trust the second
    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      for (r <- 1 to rounds)
        timed(s"$name warm$r") {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        }
      SessionMemo.coldMode = true
      for (r <- 1 to rounds) {
        timed(s"$name cold$r") {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        }
        SessionMemo.drainColdOrphans()
      }
      SessionMemo.coldMode = false
      kernel(name)
    }
    spark.stop()
  }
}
