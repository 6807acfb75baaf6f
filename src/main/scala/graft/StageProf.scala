package graft
import org.apache.spark.sql.SparkSession

/** Per-STAGE attribution for one cold rebuild of named queries: stage
  * id, task count, summed executor/GC/shuffle metrics, and the first
  * line of the stage's call site. ColdProf says WHICH query is
  * expensive; this says WHERE inside it the exec-seconds go (task
  * work vs codegen-wait vs fetch), which §1.1 wants answered before
  * any change. Usage: `runMain graft.StageProf <query> [query ...]`
  * against SPARK_GRAFT_SF_DIR. */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int)]()
    case class Agg(var tasks: Int = 0, var execMs: Long = 0, var gcMs: Long = 0,
                   var deserMs: Long = 0, var shufWriteB: Long = 0,
                   var shufReadB: Long = 0, var fetchWaitMs: Long = 0,
                   var resultSerMs: Long = 0)
    val agg = new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
          val site = e.stageInfo.details.linesIterator.take(1).mkString
          stages.put(e.stageInfo.stageId, (site, e.stageInfo.numTasks)); ()
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            val a = agg.computeIfAbsent(e.stageId, _ => Agg())
            a.synchronized {
              a.tasks += 1
              a.execMs += m.executorRunTime
              a.gcMs += m.jvmGCTime
              a.deserMs += m.executorDeserializeTime
              a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
              a.shufReadB += m.shuffleReadMetrics.totalBytesRead
              a.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
              a.resultSerMs += m.resultSerializationTime
            }
            ()
          }
        }
      })
    SparkEntry.warm(spark, sfDir)
    for (name <- args; fn <- SparkEntry.queries.get(name)) {
      agg.clear(); stages.clear()
      SessionMemo.coldMode = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      SessionMemo.drainColdOrphans()
      SessionMemo.coldMode = false
      Thread.sleep(500)
      println(f"[stageprof] ===== $name cold wall $wall%.2fs =====")
      import scala.jdk.CollectionConverters._
      val rows = agg.asScala.toSeq.sortBy(-_._2.execMs)
      val totalExec = rows.map(_._2.execMs).sum / 1e3
      println(f"[stageprof] total exec $totalExec%.1fs over ${rows.size} stages, ${rows.map(_._2.tasks).sum} tasks")
      for ((sid, a) <- rows.take(25)) {
        val site = stages.getOrDefault(sid, ("?", 0))._1.take(90)
        println(f"[stageprof] stage $sid%4d tasks ${a.tasks}%4d exec ${a.execMs / 1e3}%7.2fs gc ${a.gcMs / 1e3}%5.2fs deser ${a.deserMs / 1e3}%5.2fs fetchW ${a.fetchWaitMs / 1e3}%5.2fs shufW ${a.shufWriteB / 1048576.0}%7.1fMB shufR ${a.shufReadB / 1048576.0}%7.1fMB  $site")
      }
    }
    spark.stop()
  }
}
