package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Strongly-connected components of the directed part-adjacency graph
  * via FW-BW-Trim with Orzan coloring — the published scalable
  * distributed SCC recipe (trim singleton SCCs, color = max-ancestor
  * fixpoint, settle each color root's SCC by backward reach inside its
  * color class, peel, repeat):
  *
  *  - TRIM: a node with no in-edges or no out-edges among live nodes
  *    is a singleton SCC — remove iteratively. This dissolves the
  *    DAG-ish bulk (the measured corpus settles ~95% of nodes here).
  *  - COLOR: propagate max node id along edges to fixpoint (the same
  *    delta-frontier shape as connected components).
  *  - SETTLE: nodes that can reach their color's root while staying in
  *    the color class form exactly SCC(root); label the group by its
  *    MIN member (the engine-neutral canonical id) and peel it.
  *
  * The corpus needs 1-2 color passes (measured at sf0.01/sf0.1); the
  * loop guard is a generous iteration budget, not a correctness bound —
  * fixpoints make the result exact, so the oracle may compute SCC any
  * other way (it uses reachability closure by path-doubling, feasible
  * at oracle scale only).
  *
  * Scale: every step is a self-join or anti-join on the LIVE subgraph,
  * which shrinks monotonically; nothing is collected to the driver and
  * no transitive closure is ever materialized on the Spark side.
  */
object Scc {
  /** order-key modulus that sparsifies the adjacency into mixed SCC
    * structure (a giant SCC plus tails would trim to nothing
    * interesting at mod 1). */
  val SccMod = 20L

  /** guard on total driver iterations across trims/fixpoints. */
  val MaxIters = 400

  /** directed edges: part at line n → part at line n+1 within the
    * sampled orders, distinct. */
  def adjacencyEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tpch.table(spark, dir, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(SccMod)) === 0L)
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_partkey").as("pk"))
    li.select(col("ok"), col("ln"), col("pk").as("src"))
      .join(li.select(col("ok"), (col("ln") - 1).as("ln"),
        col("pk").as("dst")), Seq("ok", "ln"))
      .select("src", "dst").distinct()
  }

  private def budgetCheck(iters: Int): Unit =
    require(iters < MaxIters, s"Scc exceeded $MaxIters driver iterations")

  /** (node, scc_id) for every node with at least one edge; scc_id is
    * the minimum member id of the node's SCC. */
  def scc(spark: SparkSession, dir: String): DataFrame =
    sccOf(adjacencyEdges(spark, dir))

  /** FW-BW-Trim over any directed edge set `(src, dst)`. */
  def sccOf(edges0: DataFrame): DataFrame = {
    var iters = 0
    var edges = edges0.select("src", "dst")
      .transform(graft.plans.Lineage.pin)
    var alive = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct().transform(graft.plans.Lineage.pin)
    var result: DataFrame = null
    def add(df: DataFrame): Unit = {
      result = if (result == null) df else result.unionByName(df)
      result = result.transform(graft.plans.Lineage.pin)
    }
    var outer = true
    while (outer) {
      budgetCheck(iters); iters += 1
      // ---- TRIM to fixpoint: no-in or no-out ⇒ singleton SCC
      var trimming = true
      while (trimming) {
        budgetCheck(iters); iters += 1
        val ins = edges.select(col("dst").as("node")).distinct()
        val outs = edges.select(col("src").as("node")).distinct()
        val dead = alive
          .join(ins.withColumn("i", lit(1)), Seq("node"), "left")
          .join(outs.withColumn("o", lit(1)), Seq("node"), "left")
          .filter(col("i").isNull || col("o").isNull)
          .select("node").transform(graft.plans.Lineage.pin)
        if (dead.isEmpty) trimming = false
        else {
          add(dead.select(col("node"), col("node").as("scc_id")))
          alive = alive.join(dead, Seq("node"), "left_anti")
            .transform(graft.plans.Lineage.pin)
          val d1 = dead.select(col("node").as("dn"))
          edges = edges
            .join(d1, col("src") === col("dn"), "left_anti")
            .join(d1, col("dst") === col("dn"), "left_anti")
            .transform(graft.plans.Lineage.pin)
        }
      }
      if (alive.isEmpty) outer = false
      else {
        // ---- COLOR: max-ancestor fixpoint (delta frontier)
        var color = alive.select(col("node"), col("node").as("c"))
          .transform(graft.plans.Lineage.pin)
        var frontier = color
        while (!frontier.isEmpty) {
          budgetCheck(iters); iters += 1
          val msgs = frontier.select(col("node").as("src"), col("c"))
            .join(edges, "src")
            .groupBy(col("dst").as("node")).agg(max("c").as("mc"))
          val merged = color.join(msgs, Seq("node"), "left")
            .select(col("node"),
              greatest(col("c"), coalesce(col("mc"), col("c"))).as("c"),
              (col("mc") > col("c")).as("chg"))
            .transform(graft.plans.Lineage.pin)
          frontier = merged.filter(col("chg")).select("node", "c")
          color = merged.select("node", "c")
        }
        // ---- SETTLE: backward reach to the color root within the class
        val colSrc = color.select(col("node").as("src"), col("c").as("csrc"))
        val colDst = color.select(col("node").as("dst"), col("c").as("cdst"))
        val classEdges = edges.join(colSrc, "src").join(colDst, "dst")
          .filter(col("csrc") === col("cdst"))
          .select("src", "dst").transform(graft.plans.Lineage.pin)
        var settled = color.filter(col("node") === col("c")).select("node")
          .transform(graft.plans.Lineage.pin)
        var sFrontier = settled
        while (!sFrontier.isEmpty) {
          budgetCheck(iters); iters += 1
          val reach = classEdges
            .join(sFrontier.select(col("node").as("dst")), "dst")
            .select(col("src").as("node")).distinct()
            .join(settled, Seq("node"), "left_anti")
            .transform(graft.plans.Lineage.pin)
          sFrontier = reach
          if (!reach.isEmpty)
            settled = settled.unionByName(reach).transform(graft.plans.Lineage.pin)
        }
        // canonical id = min member of each settled color group
        val grouped = settled.join(color, "node")
        val canon = grouped.groupBy("c").agg(min("node").as("scc_id"))
        add(grouped.join(canon, "c").select("node", "scc_id"))
        alive = alive.join(settled, Seq("node"), "left_anti")
          .transform(graft.plans.Lineage.pin)
        val s1 = settled.select(col("node").as("dn"))
        edges = edges
          .join(s1, col("src") === col("dn"), "left_anti")
          .join(s1, col("dst") === col("dn"), "left_anti")
          .transform(graft.plans.Lineage.pin)
        if (alive.isEmpty) outer = false
      }
    }
    result
  }
}
