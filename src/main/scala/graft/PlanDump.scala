package graft
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named queries to files — the
  * optimization-round evidence artifact (`plans/rN/<query>_<tag>.txt`).
  *
  * Memoized queries are dumped under [[SessionMemo.coldMode]] so the
  * file shows the COMPUTE plan (what the honest-cold pass executes),
  * not a one-line cache read; the shared input layer stays whatever
  * the session has (cold dumps here run on a fresh session, so input
  * reads appear as parquet scans — at the bench they would be
  * InMemoryRelations, which changes leaf nodes, not join/exchange
  * shape).
  *
  * `runMain graft.PlanDump <outDir> <tag> <query> [query ...]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (outDir, tag, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // try/finally: an early crash must not leave coldMode set in the
    // JVM; unknown names warn instead of silently producing no file
    // (ADVICE r14)
    SessionMemo.coldMode = true
    try {
      for (name <- names) SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"[plandump] unknown query: $name (not in SparkEntry.queries)")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), txt)
            SessionMemo.drainColdOrphans()
            println(s"[plandump] wrote ${name}_$tag.txt (${txt.length} chars)")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    } finally SessionMemo.coldMode = false
    spark.stop()
  }
}
