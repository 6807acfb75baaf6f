package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: print Catalyst size estimates vs actual cached bytes
  * for the memoized edge tables, to ground sizedPartitions. */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def show(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.optimizedPlan
      val leaves = p.collectLeaves().map(_.stats.sizeInBytes)
      println(s"[stats] $tag plan=${p.stats.sizeInBytes} leaves=${leaves.mkString(",")}")
    }
    val rels = graft.model.TpchGraph.relsLite(spark, sfDir)
    show("relsLite (cold)", rels)
    def sym(e: org.apache.spark.sql.DataFrame) =
      e.select(col("src"), col("dst"))
        .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    show("symAll (cold)", sym(rels))
    val n = rels.count()
    println(s"[stats] rels rows=$n")
    show("relsLite (warm)", graft.model.TpchGraph.relsLite(spark, sfDir))
    show("symAll (warm)", sym(graft.model.TpchGraph.relsLite(spark, sfDir)))
    val info = spark.sparkContext.getRDDStorageInfo
    info.foreach(i => println(s"[stats] cached ${i.name} mem=${i.memSize}"))
    spark.stop()
  }
}
