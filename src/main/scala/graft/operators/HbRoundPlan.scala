package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.TpchGraph

/** Dumps the formatted physical plan of ONE HyperBall register-merge
  * round (seeded regs → edge join → per-node merge). The family's
  * declared outputs are eagerly checkpointed (LogicalRDD), so
  * [[graft.PlanDump]] on it_hyperball shows an 8-line scan — the
  * pyramid's exchange schema, the thing the register packing changes,
  * is only visible on the round subplan itself. Usage:
  * `runMain graft.operators.HbRoundPlan <outFile>` against
  * SPARK_GRAFT_SF_DIR. */
object HbRoundPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("plans/r15/hyperball_round.txt")
    // "wide": reconstruct the r14 one-int-column-per-bucket layout
    // (64 max aggregations) so the before-plan's exchange schema is
    // dumpable from the same HEAD — the production path is the packed
    // form below.
    val wide = args.lift(1).contains("wide")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = Iterative.symAllSrc(spark, sfDir)
    val h = Sketch.mix(pmod(col("node"), lit(Sketch.HashMod)))
    val seeded = TpchGraph.nodes(spark, sfDir)
      .select(col("id").as("node"))
      .select(col("node"), shiftright(h, HyperBall.SuffixBits).as("bucket"),
        (lit(HyperBall.Scale) -
          HyperBall.bitLen(pmod(h, lit(1L << HyperBall.SuffixBits)))).as("rho"))
    val round = if (wide) {
      val regCols = (0 until HyperBall.Buckets).map(j =>
        when(col("bucket") === j, col("rho")).otherwise(lit(0))
          .cast("int").as(s"r$j"))
      val regs = seeded.select(col("node") +: regCols: _*)
      val maxCols = (0 until HyperBall.Buckets).map(j => max(s"r$j").as(s"r$j"))
      val fromNbrs = edges
        .join(regs.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node") +:
          (0 until HyperBall.Buckets).map(j => col(s"r$j")): _*)
      regs.unionByName(fromNbrs)
        .groupBy("node").agg(maxCols.head, maxCols.tail: _*)
    } else {
      val regs = seeded.select(col("node") +: HyperBall.packCols: _*)
      HyperBall.mergeRound(regs, edges)
    }
    val txt = round.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val p = java.nio.file.Paths.get(out)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, txt)
    println(s"[hbplan] wrote $out (${txt.length} chars)")
    spark.stop()
  }
}
