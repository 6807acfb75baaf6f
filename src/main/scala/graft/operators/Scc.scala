package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.Lineage

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
  * Scale/driver-cost design (reworked round 7 — the original trim loop
  * recomputed `distinct` in/out endpoint sets of the FULL live edge
  * table every round plus an `isEmpty` action, the round-6 verdict's #2
  * perf finding):
  *
  *  - The edge table is pinned ONCE and never rewritten during trim.
  *    Trim maintains a per-node (din, dout) DEGREE table and peels by
  *    degree-delta, exactly the [[Iterative.corenessOf]] shape: a dead
  *    node's edges decrement only its neighbors' degrees, via two joins
  *    of the cached edge table against the (usually broadcast-sized)
  *    dead set — no per-round edge anti-joins, no per-round distincts.
  *  - One `count` action per trim round (the dead set; its value also
  *    drives the broadcast-hint guard and the exact running live-node
  *    count) plus the degree pin.
  *  - SEQUENTIAL CUTOFF: the published parallel FW-BW-Trim
  *    implementations (Hong, Rodia & Olukotun, PPoPP 2013; Slota,
  *    Rajamanickam & Madduri, IPDPS 2014) all switch to sequential
  *    Tarjan once the live remainder fits one worker — iterative label
  *    propagation on a straggler chain of 40 nodes costs a full
  *    scheduler round per hop while a local solve is microseconds. We
  *    do the same: when the live set is under
  *    `graft.scc.localNodeCutoff` nodes AND its induced edge set is
  *    under `graft.scc.localEdgeCutoff` rows (both bounded constants,
  *    independent of corpus scale — the same driver-side contract as
  *    TakeOrderedAndProject's top-k merge), the remainder is collected
  *    and solved with iterative Tarjan, exactly. Cores larger than the
  *    cutoff keep the fully distributed COLOR/SETTLE path below — at
  *    100 TB the trim rounds and any giant-SCC coloring all run
  *    distributed, and only the bounded tail ever reaches the driver.
  *  - COLOR/SETTLE (distributed path) run on the live subgraph
  *    materialized once per outer phase; per round they pin one frame
  *    and count one frontier.
  *
  * Every distributed step remains a join/anti-join on the live
  * subgraph, which shrinks monotonically; no transitive closure is
  * ever materialized.
  */
object Scc {
  /** order-key modulus that sparsifies the adjacency into mixed SCC
    * structure (a giant SCC plus tails would trim to nothing
    * interesting at mod 1). */
  val SccMod = 20L

  /** guard on total driver iterations across trims/fixpoints. */
  val MaxIters = 400

  /** sequential-cutoff bounds (see scaladoc above); overridable per
    * session so specs can force the distributed COLOR/SETTLE path. */
  val LocalNodeCutoffKey = "graft.scc.localNodeCutoff"
  val LocalEdgeCutoffKey = "graft.scc.localEdgeCutoff"
  val LocalNodeCutoffDefault = 100000L
  val LocalEdgeCutoffDefault = 1000000L

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

  private def sccLog(msg: => String): Unit =
    if (sys.env.contains("GRAFT_ITER_LOG")) {
      val t = System.nanoTime() / 1e9
      println(f"[scc] $t%.2f $msg")
    }

  /** (node, scc_id) for every node with at least one edge; scc_id is
    * the minimum member id of the node's SCC. */
  def scc(spark: SparkSession, dir: String): DataFrame =
    sccOf(adjacencyEdges(spark, dir))

  /** FW-BW-Trim over any directed edge set `(src, dst)`. */
  def sccOf(edges0: DataFrame): DataFrame = {
    val spark = edges0.sparkSession
    val maxRows = Iterative.broadcastMaxRows(spark)
    val nodeCutoff = spark.conf.getOption(LocalNodeCutoffKey)
      .map(_.toLong).getOrElse(LocalNodeCutoffDefault)
    val edgeCutoff = spark.conf.getOption(LocalEdgeCutoffKey)
      .map(_.toLong).getOrElse(LocalEdgeCutoffDefault)
    var iters = 0
    var edges = Lineage.pin(edges0.select("src", "dst"))
    var parts: List[DataFrame] = Nil
    var outer = true
    while (outer) {
      budgetCheck(iters); iters += 1
      // ---- TRIM by degree-delta peel: no-in or no-out ⇒ singleton
      // SCC. `deg` covers every CURRENT edge endpoint; a node missing
      // one side starts dead (coalesce 0). Runs until fixpoint OR until
      // the exact running live count (initial − Σ dead, no extra jobs)
      // drops under the sequential cutoff.
      var deg = Lineage.pin(
        edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("dout"))
          .join(edges.groupBy(col("dst").as("node"))
            .agg(count(lit(1)).as("din")), Seq("node"), "full")
          .select(col("node"),
            coalesce(col("din"), lit(0L)).as("din"),
            coalesce(col("dout"), lit(0L)).as("dout")))
      var liveRows = deg.count()
      var trimming = liveRows > nodeCutoff
      while (trimming) {
        budgetCheck(iters); iters += 1
        val dead = deg.filter(col("din") <= 0 || col("dout") <= 0)
          .select("node")
        val deadRows = dead.count()
        sccLog(s"trim dead=$deadRows live=${liveRows - deadRows}")
        if (deadRows == 0) trimming = false
        else {
          parts ::= dead.select(col("node"), col("node").as("scc_id"))
            .localCheckpoint(false)
          val lossIn = edges
            .join(Iterative.hinted(dead.select(col("node").as("src")),
              deadRows, maxRows), "src")
            .groupBy(col("dst").as("node")).agg(count(lit(1)).as("li"))
          val lossOut = edges
            .join(Iterative.hinted(dead.select(col("node").as("dst")),
              deadRows, maxRows), "dst")
            .groupBy(col("src").as("node")).agg(count(lit(1)).as("lo"))
          deg = Lineage.pin(deg.filter(col("din") > 0 && col("dout") > 0)
            .join(Iterative.hinted(lossIn, deadRows, maxRows), Seq("node"), "left")
            .join(Iterative.hinted(lossOut, deadRows, maxRows), Seq("node"), "left")
            .select(col("node"),
              (col("din") - coalesce(col("li"), lit(0L))).as("din"),
              (col("dout") - coalesce(col("lo"), lit(0L))).as("dout")))
          liveRows -= deadRows
          if (liveRows <= nodeCutoff) trimming = false
        }
      }
      val live = deg.select("node")
      sccLog(s"phase live=$liveRows")
      if (liveRows == 0) outer = false
      else {
        // live subgraph, materialized once for the tail solve or the
        // color+settle phase
        val liveEdges = Lineage.pin(edges
          .join(Iterative.hinted(live.select(col("node").as("src")),
            liveRows, maxRows), "src")
          .join(Iterative.hinted(live.select(col("node").as("dst")),
            liveRows, maxRows), "dst"))
        val liveEdgeRows = liveEdges.count()
        if (liveRows <= nodeCutoff && liveEdgeRows <= edgeCutoff) {
          // ---- SEQUENTIAL CUTOFF: bounded remainder → exact Tarjan.
          // Trim-pending zero-degree survivors (possible when the trim
          // loop exited on the cutoff, not the fixpoint) fall out as
          // Tarjan singletons like any other node.
          sccLog(s"local solve nodes=$liveRows edges=$liveEdgeRows")
          val liveNodes = live.collect().map(_.getLong(0))
          val liveEdgeArr = liveEdges.select("src", "dst").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          import spark.implicits._
          parts ::= tarjanLocal(liveNodes, liveEdgeArr).toSeq
            .toDF("node", "scc_id")
          outer = false
        } else {
        // ---- COLOR: max-ancestor fixpoint (delta frontier)
        var color = Lineage.pin(live.select(col("node"), col("node").as("c")))
        var frontier = color
        var frontierRows = liveRows
        while (frontierRows > 0) {
          budgetCheck(iters); iters += 1
          val msgs = liveEdges
            .join(Iterative.hinted(frontier
              .select(col("node").as("src"), col("c")),
              frontierRows, maxRows), "src")
            .groupBy(col("dst").as("node")).agg(max("c").as("mc"))
          val merged = Lineage.pin(color.join(msgs, Seq("node"), "left")
            .select(col("node"),
              greatest(col("c"), coalesce(col("mc"), col("c"))).as("c"),
              (col("mc") > col("c")).as("chg")))
          frontier = merged.filter(col("chg")).select("node", "c")
          frontierRows = frontier.count()
          sccLog(s"color frontier=$frontierRows")
          color = merged.select("node", "c")
        }
        // ---- SETTLE: backward reach to the color root within the class
        val colSrc = color.select(col("node").as("src"), col("c").as("csrc"))
        val colDst = color.select(col("node").as("dst"), col("c").as("cdst"))
        val classEdges = Lineage.pin(liveEdges
          .join(colSrc, "src").join(colDst, "dst")
          .filter(col("csrc") === col("cdst"))
          .select("src", "dst"))
        var settled = Lineage.pin(
          color.filter(col("node") === col("c")).select("node"))
        var sFrontier = settled
        var sRows = settled.count()
        while (sRows > 0) {
          budgetCheck(iters); iters += 1
          val reach = Lineage.pin(classEdges
            .join(Iterative.hinted(sFrontier.select(col("node").as("dst")),
              sRows, maxRows), "dst")
            .select(col("src").as("node")).distinct()
            .join(settled, Seq("node"), "left_anti"))
          sFrontier = reach
          sRows = reach.count()
          sccLog(s"settle reach=$sRows")
          if (sRows > 0)
            settled = Lineage.pin(settled.unionByName(reach))
        }
        // canonical id = min member of each settled color group
        val grouped = settled.join(color, "node")
        val canon = grouped.groupBy("c").agg(min("node").as("scc_id"))
        parts ::= grouped.join(canon, "c").select("node", "scc_id")
          .localCheckpoint(false)
        // peel the settled SCCs; next outer phase re-derives degrees
        val s1 = settled.select(col("node").as("dn"))
        edges = Lineage.pin(liveEdges
          .join(s1, col("src") === col("dn"), "left_anti")
          .join(s1, col("dst") === col("dn"), "left_anti"))
        }
      }
    }
    parts match {
      case Nil =>
        // empty edge set: typed empty frame, mirroring Msf.msfOf
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("node", "scc_id")
      case head :: tail => tail.foldLeft(head)(_ unionByName _)
    }
  }

  /** Iterative (explicit-stack) Tarjan over the collected remainder —
    * runs on the driver for at most `localNodeCutoff` nodes /
    * `localEdgeCutoff` edges; returns (node, min-member scc_id). */
  private def tarjanLocal(nodes: Array[Long],
      edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val n = nodes.length
    val idx = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    var i = 0
    while (i < n) { idx.put(nodes(i), i); i += 1 }
    // CSR adjacency
    val off = new Array[Int](n + 1)
    for ((s, _) <- edges) off(idx.get(s) + 1) += 1
    i = 1
    while (i <= n) { off(i) += off(i - 1); i += 1 }
    val adj = new Array[Int](edges.length)
    val fill = java.util.Arrays.copyOf(off, n)
    for ((s, d) <- edges) {
      val si: Int = idx.get(s); adj(fill(si)) = idx.get(d); fill(si) += 1
    }
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStack = new Array[Boolean](n)
    val comp = Array.fill(n)(-1)
    val sccStack = new java.util.ArrayDeque[Integer]
    val callV = new Array[Int](n)
    val callE = new Array[Int](n)
    var counter = 0
    var nComp = 0
    var v0 = 0
    while (v0 < n) {
      if (index(v0) == -1) {
        var top = 0
        callV(0) = v0; callE(0) = off(v0)
        index(v0) = counter; low(v0) = counter; counter += 1
        sccStack.push(v0); onStack(v0) = true
        while (top >= 0) {
          val v = callV(top)
          if (callE(top) < off(v + 1)) {
            val w = adj(callE(top)); callE(top) += 1
            if (index(w) == -1) {
              index(w) = counter; low(w) = counter; counter += 1
              sccStack.push(w); onStack(w) = true
              top += 1; callV(top) = w; callE(top) = off(w)
            } else if (onStack(w) && index(w) < low(v)) low(v) = index(w)
          } else {
            if (low(v) == index(v)) {
              var w = -1
              while (w != v) {
                w = sccStack.pop()
                onStack(w) = false; comp(w) = nComp
              }
              nComp += 1
            }
            top -= 1
            if (top >= 0) {
              val p = callV(top)
              if (low(v) < low(p)) low(p) = low(v)
            }
          }
        }
      }
      v0 += 1
    }
    val minId = Array.fill(nComp)(Long.MaxValue)
    i = 0
    while (i < n) {
      if (nodes(i) < minId(comp(i))) minId(comp(i)) = nodes(i); i += 1
    }
    Array.tabulate(n)(j => (nodes(j), minId(comp(j))))
  }
}
