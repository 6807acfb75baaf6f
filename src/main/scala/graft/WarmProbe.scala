package graft
import org.apache.spark.sql.SparkSession

/** Times SparkEntry.warm in isolation — the warmup-budget iteration
  * loop (pool size, fill ordering) without paying a full bench run.
  * Usage: GRAFT_WARM_THREADS=16 tools/run_main.sh graft.WarmProbe [sfDir]
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    SparkEntry.warm(spark, sfDir)
    println(f"""{"warmup_sec":${(System.nanoTime() - t0) / 1e9}%.1f,"threads":"${sys.env.getOrElse("GRAFT_WARM_THREADS", "8")}"}""")
    spark.stop()
  }
}
