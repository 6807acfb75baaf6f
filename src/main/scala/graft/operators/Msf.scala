package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Borůvka minimum-spanning-forest over the co-purchase part graph —
  * the classic O(log V)-round distributed MST algorithm (each round
  * every component picks its cheapest outgoing edge, chosen edges merge
  * components, repeat on the contracted graph).
  *
  * Weights are made STRICTLY UNIQUE (`wu = (WBase − count)·E10 +
  * a·AScale + b`), which buys two exactness properties: the MSF is
  * unique (so the oracle must land on the identical edge set), and a
  * mutual choice between two components is provably the SAME edge (the
  * 2-cycle argument needs distinct weights), so chosen-edge dedup is a
  * plain `distinct`. Minimizing `WBase − count` makes this the
  * maximum-co-purchase spanning forest — the "similarity backbone" a
  * recommender would extract.
  *
  * Scale shape: each round is (edge relabel join ⋈ per-component
  * argmin window ⋈ pointer-jumping on a components-sized table). The
  * edge table shrinks as components merge, the jumping table is
  * component-count-sized (≤ V/2^round), and rounds are ≤ log₂V — the
  * textbook Borůvka bound. Nothing is ever collected to the driver.
  * The [[MsfJumps]] pointer-doubling bound covers chains of depth 2^12;
  * component counts beyond that (≫ the bench corpus) would raise it —
  * both engines share the constant, so parity is structural.
  */
object Msf {
  /** generous round bound: Borůvka halves the component count per
    * round, so 12 rounds cover 4096 initial components; extra rounds
    * past the fixpoint choose nothing on both engines. */
  val MsfRounds = 12

  /** pointer-doubling steps per contraction — exact for parent-chain
    * depth ≤ 2^12. */
  val MsfJumps = 12

  /** unique-weight packing: count < WBase, partkey < AScale. */
  val WBase = 1000000L
  val AScale = 100000L
  val E10 = 10000000000L

  /** (a, b, w, wu) undirected co-purchase edges, a < b, w = number of
    * orders containing both parts, wu strictly unique. */
  def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tpch.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.select(col("ok"), col("pk").as("a"))
      .join(li.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .withColumn("wu",
        (lit(WBase) - col("w")) * lit(E10) +
          col("a") * lit(AScale) + col("b"))
  }

  /** one pointer-doubling pass: p'(c) = p(p(c)) */
  private def jump(p: DataFrame): DataFrame = {
    val q = p.select(col("c").as("jc"), col("p").as("jp"))
    p.join(q, col("p") === col("jc")).select(col("c"), col("jp").as("p"))
  }

  /** MSF edge list: (round, src, dst, w) — every edge the forest keeps,
    * tagged with the Borůvka round that chose it. */
  def msf(spark: SparkSession, dir: String): DataFrame =
    msfOf(spark, copurchaseEdges(spark, dir))

  /** Borůvka over any undirected edge set `(a, b, w, wu)` with
    * strictly-unique `wu` (a < b). */
  def msfOf(spark: SparkSession, edges0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = edges0
      .select("a", "b", "w", "wu").transform(graft.plans.Lineage.pin)
    var comp = edges.select(col("a").as("node"))
      .union(edges.select(col("b")))
      .distinct()
      .select(col("node"), col("node").as("label"))
      .transform(graft.plans.Lineage.pin)
    var mst: DataFrame = null
    var round = 1
    var done = false
    while (round <= MsfRounds && !done) {
      val c1 = comp.select(col("node").as("n1"), col("label").as("ca"))
      val c2 = comp.select(col("node").as("n2"), col("label").as("cb"))
      val e = edges
        .join(c1, col("a") === col("n1"))
        .join(c2, col("b") === col("n2"))
        .filter(col("ca") =!= col("cb"))
        .select("ca", "cb", "wu", "a", "b", "w")
      val cand = e.select(col("ca").as("c"), col("cb").as("d"),
          col("wu"), col("a"), col("b"), col("w"))
        .unionByName(e.select(col("cb").as("c"), col("ca").as("d"),
          col("wu"), col("a"), col("b"), col("w")))
      val wmin = Window.partitionBy("c").orderBy(col("wu"))
      val ch = cand.withColumn("rn", row_number().over(wmin))
        .filter(col("rn") === 1).drop("rn")
        .transform(graft.plans.Lineage.pin)
      if (ch.isEmpty) { done = true }
      else {
        // 2-cycle break: mutual choices (provably the same edge under
        // unique weights) root at the smaller component id
        val back = ch.select(col("c").as("yc"), col("d").as("yd"))
        val par = ch.join(back, col("d") === col("yc"), "left")
          .select(col("c"),
            when(col("yd") === col("c") && col("c") < col("d"), col("c"))
              .otherwise(col("d")).as("p"))
        // components with no outgoing edge parent themselves
        val allc = comp.select(col("label").as("c")).distinct()
        var p = allc.join(par.withColumnRenamed("c", "pc"),
            col("c") === col("pc"), "left")
          .select(col("c"), coalesce(col("p"), col("c")).as("p"))
          .transform(graft.plans.Lineage.pin)
        // pin every other doubling: chained self-joins square the
        // optimizer's sizeInBytes estimate per step, and localCheckpoint
        // alone carries the inflated estimate into the next round
        // (see graft.plans.Lineage) — pin truncates lineage AND stats
        for (j <- 1 to MsfJumps) {
          p = jump(p)
          if (j % 2 == 0 || j == MsfJumps) p = p.transform(graft.plans.Lineage.pin)
        }
        comp = comp.join(p, comp("label") === p("c"))
          .select(comp("node"), p("p").as("label"))
          .transform(graft.plans.Lineage.pin)
        val chosen = ch.select(lit(round.toLong).as("round"),
          col("a").as("src"), col("b").as("dst"), col("w")).distinct()
        mst = if (mst == null) chosen else mst.unionByName(chosen)
        mst = mst.transform(graft.plans.Lineage.pin)
        round += 1
      }
    }
    if (mst == null)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("round",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("src",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dst",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("w",
            org.apache.spark.sql.types.LongType))))
    else mst
  }
}
