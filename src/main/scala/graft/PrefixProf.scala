package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split profiler for `dd_prefix_join` (r14): the isolated cold
  * rebuild measured 24× the plain inverted-index twin on the same
  * output — this splits the AllPairs/PPJoin pipeline into its stages
  * (df agg, window rank, prefix self-join, candidate distinct, exact
  * verify) so the dominant stage is a measurement, not a guess.
  * `runMain graft.operators.PrefixProf [rounds]` against
  * SPARK_GRAFT_SF_DIR (the object lives in graft.operators to reach
  * Dedup's private[operators] internals — ADVICE r14 doc fix). */
object PrefixProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = args.headOption.map(_.toInt).getOrElse(2)
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
    def phase(r: Int, name: String)(body: => Long): Unit = {
      val e0 = execMs.get()
      val t0 = System.nanoTime()
      val n = body
      Thread.sleep(150)
      println(f"[pprof] round $r phase $name%-12s wall ${(System.nanoTime() - t0) / 1e9}%7.2fs exec ${(execMs.get() - e0) / 1e3}%7.1fs rows $n")
    }
    TextOps.ensureRegistered(spark)
    val sh = Dedup.nearShingles(spark, sfDir)
    phase(0, "shingles") { sh.count() }
    for (r <- 1 to rounds) {
      val df = sh.groupBy("sfp").agg(count(lit(1)).as("df"))
      phase(r, "df_agg") { df.count() }
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("df", "sfp")
      val pref = sh.join(df, "sfp")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .join(sizes, "doc_id")
        .filter(col("rnk") <= col("nsh") - expr("(nsh + 1) div 2") + 1)
        .select("doc_id", "sfp", "nsh")
        .persist()
      phase(r, "pref_window") { pref.count() }
      val cand = pref.select(col("doc_id").as("a"), col("sfp"), col("nsh").as("na"))
        .join(pref.select(col("doc_id").as("b"), col("sfp"), col("nsh").as("nb")), "sfp")
        .filter(col("a") < col("b"))
        .filter(lit(2) * least(col("na"), col("nb")) >=
          greatest(col("na"), col("nb")))
        .select("a", "b").distinct().persist()
      phase(r, "cand_join") { cand.count() }
      val withA = cand
        .join(sh.select(col("doc_id").as("a"), col("sfp")), "a").persist()
      phase(r, "verify_a") { withA.count() }
      val inter = withA
        .join(sh.select(col("doc_id").as("b"), col("sfp")), Seq("b", "sfp"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter")).persist()
      phase(r, "verify_b") { inter.count() }
      val szs = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh")).persist()
      phase(r, "sizes") { szs.count() }
      val scored = inter
        .join(szs.select(col("doc_id").as("a"), col("nsh").as("na")), "a")
        .join(szs.select(col("doc_id").as("b"), col("nsh").as("nb")), "b")
        .withColumn("jacc", col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jacc") >= Dedup.Tau)
      phase(r, "score") { scored.count() }
      Seq(pref, cand, withA, inter, szs).foreach(_.unpersist())
    }
    spark.stop()
  }
}
