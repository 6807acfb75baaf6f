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
  * Scale shape: each round is (per-component argmin window ⋈
  * pointer-jumping on a components-sized table ⋈ edge contraction).
  * The CARRIED edge table is contracted — relabeled to component
  * roots and stripped of internal edges — every round, the jumping
  * table is component-count-sized (≤ V/2^round) and usually
  * broadcast, and rounds are ≤ log₂V — the textbook Borůvka bound.
  * Pointer doubling runs to a counted fixpoint (exact at any chain
  * depth); nothing is ever collected to the driver.
  */
object Msf {
  /** generous round bound: Borůvka halves the component count per
    * round, so 12 rounds cover 4096 initial components; extra rounds
    * past the fixpoint choose nothing on both engines. */
  val MsfRounds = 12

  /** hard cap on pointer-doubling steps per contraction; the loop
    * exits at the counted fixpoint (usually 2-3 doublings), so this is
    * a runaway guard covering chains of depth 2^12, not a bound the
    * result depends on. */
  val MsfJumps = 12

  /** unique-weight packing: count < WBase, partkey < AScale. */
  val WBase = 1000000L
  val AScale = 100000L
  val E10 = 10000000000L

  /** Edge bound under which the REMAINING Borůvka rounds finish in one
    * sequential task ([[boruvkaTail]]) instead of the distributed loop
    * — the same escape-hatch policy as [[Scc]]'s sequential cutoff and
    * [[Iterative.CcLocalEdgeCutoffKey]]: each distributed round costs a
    * window + pointer doubling + two contraction joins (~8 jobs) even
    * when the live edge table has shrunk to a size one task holds
    * trivially (6 primitive long columns × 20M rows ≈ 1 GB). At 100 TB
    * the initial co-purchase table is far over the cutoff, so early
    * rounds run distributed and the tail takes over once contraction
    * has done its (geometric) work. MsfSpec runs every fixture through
    * BOTH paths and asserts identical edge sets. */
  val MsfLocalEdgeCutoffKey = "graft.msf.localEdgeCutoff"
  val MsfLocalEdgeCutoffDefault = 20000000L

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

  /** session-memoized co-purchase edge table — the pair-expansion +
    * groupBy build is the expensive prefix of every [[msf]] call and
    * is identical across the bench's repeat runs. */
  private val edgeMemo = new graft.SessionMemo[DataFrame]
  private def copurchaseCached(spark: SparkSession, dir: String): DataFrame =
    edgeMemo.getOrElseUpdate(spark, dir)(
      copurchaseEdges(spark, dir).persist())

  /** MSF edge list: (round, src, dst, w) — every edge the forest keeps,
    * tagged with the Borůvka round that chose it. */
  def msf(spark: SparkSession, dir: String): DataFrame =
    msfMemo.getOrElseUpdate(spark, dir)(
      msfOf(spark, copurchaseCached(spark, dir)).persist())

  /** The Borůvka rounds re-ran per touch (r12: 13.8 exec-s warm) —
    * pure function of (session, dir), same output-memo lifecycle as
    * the other iterative fixpoints: fill on first timed touch, cold
    * pass prices the rebuild (VERDICT r12 Next #1). */
  private val msfMemo = new graft.SessionMemo[DataFrame](outputMemo = true)

  /** Borůvka over any undirected edge set `(a, b, w, wu)` with
    * strictly-unique `wu` (a < b).
    *
    * Round-7 rework, after the r6 driver bench put `it_msf` in the
    * suite's top five (10.9 s median): the loop now CONTRACTS — the
    * carried state is the component-labeled edge table `ec`, relabeled
    * and shrunk every round (the textbook Borůvka contraction the
    * previous version skipped: it re-joined the FULL original edge set
    * against a node→label table each round), and pointer doubling runs
    * to a counted fixpoint instead of a fixed 12 jumps (hook trees
    * settle in 2-3 doublings; 12 joins + pins per round were pure
    * overhead — and the count makes the depth bound exact at any
    * scale, retiring the 2^12-chain caveat). The per-node component
    * table is gone entirely: the MSF output is the chosen edge list,
    * which never needed it. `ch` has exactly one row per live
    * component, so its count drives the broadcast-hint guard for every
    * join against `p`. */
  def msfOf(spark: SparkSession, edges0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxRows = Iterative.broadcastMaxRows(spark)
    val cutoff = spark.conf.getOption(MsfLocalEdgeCutoffKey).map(_.toLong)
      .getOrElse(MsfLocalEdgeCutoffDefault)
    // component-labeled live edges: (ca, cb) start as the endpoints
    var ec = edges0.select(col("a").as("ca"), col("b").as("cb"),
        col("wu"), col("a"), col("b"), col("w"))
      .transform(graft.plans.Lineage.pin)
    var parts: List[DataFrame] = Nil
    var round = 1
    var done = false
    while (round <= MsfRounds && !done) {
      // ec is pinned (materialized) each round, so this count is a
      // cached-block scan, not a recompute
      if (ec.count() <= cutoff) {
        parts ::= boruvkaTail(ec, round)
        done = true
      } else {
      val cand = ec.select(col("ca").as("c"), col("cb").as("d"),
          col("wu"), col("a"), col("b"), col("w"))
        .unionByName(ec.select(col("cb").as("c"), col("ca").as("d"),
          col("wu"), col("a"), col("b"), col("w")))
      val wmin = Window.partitionBy("c").orderBy(col("wu"))
      val ch = cand.withColumn("rn", row_number().over(wmin))
        .filter(col("rn") === 1).drop("rn")
        .transform(graft.plans.Lineage.pin)
      val compRows = ch.count() // one row per live component
      if (compRows == 0) { done = true }
      else {
        // 2-cycle break: mutual choices (provably the same edge under
        // unique weights) root at the smaller component id. Every live
        // component chooses (it has an edge), so `par` is total over
        // ec's labels — no fill-in join needed.
        val back = ch.select(col("c").as("yc"), col("d").as("yd"))
        var p = ch.join(back, col("d") === col("yc"), "left")
          .select(col("c"),
            when(col("yd") === col("c") && col("c") < col("d"), col("c"))
              .otherwise(col("d")).as("p"))
          .transform(graft.plans.Lineage.pin)
        // pointer doubling to a COUNTED fixpoint; pin each step (the
        // chained self-join is the stats-squaring shape
        // graft.plans.Lineage exists for)
        var jumps = 0
        var moving = true
        while (moving && jumps < MsfJumps) {
          val q = p.select(col("c").as("jc"), col("p").as("jp"))
          val nxt = p.join(Iterative.hinted(q, compRows, maxRows),
              col("p") === col("jc"))
            .select(col("c"), col("jp").as("p"),
              (col("jp") =!= col("p")).as("chg"))
            .transform(graft.plans.Lineage.pin)
          moving = nxt.filter(col("chg")).count() > 0
          p = nxt.select("c", "p")
          jumps += 1
        }
        // contract: relabel both endpoints to their component root and
        // drop internal edges — the carried edge table SHRINKS
        val pa = p.select(col("c").as("pca"), col("p").as("na"))
        val pb = p.select(col("c").as("pcb"), col("p").as("nb"))
        ec = ec
          .join(Iterative.hinted(pa, compRows, maxRows), col("ca") === col("pca"))
          .join(Iterative.hinted(pb, compRows, maxRows), col("cb") === col("pcb"))
          .filter(col("na") =!= col("nb"))
          .select(col("na").as("ca"), col("nb").as("cb"),
            col("wu"), col("a"), col("b"), col("w"))
          .transform(graft.plans.Lineage.pin)
        parts ::= ch.select(lit(round.toLong).as("round"),
          col("a").as("src"), col("b").as("dst"), col("w")).distinct()
          .localCheckpoint(false)
        round += 1
      }
      }
    }
    val mst = parts match {
      case Nil => null
      case head :: tail => tail.foldLeft(head)(_ unionByName _)
    }
    if (mst == null)
      emptyMsf(spark)
    else mst
  }

  private def emptyMsf(spark: SparkSession): DataFrame =
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

  /** Sequential Borůvka over the (already contracted) live edge table
    * in a SINGLE task — mapPartitions after a coalesce-to-one exchange,
    * no driver collect; the same escape-hatch shape as
    * [[Iterative]]'s union-find and [[Scc]]'s tail solve. Semantics
    * are EXACTLY the distributed rounds': per round, every live
    * component picks its min-wu incident edge (wu strictly unique, so
    * mutual picks are the same edge and dedup by identity), picked
    * edges are emitted tagged with the round number, picked edges'
    * components merge (union-find over the picks = the hook-forest
    * collapse — both partition components by connectivity under the
    * round's picked edge set), and the round counter respects the same
    * [[MsfRounds]] cap. MsfSpec asserts both paths agree edge-for-edge
    * and round-for-round. Memory: six primitive long arrays, ~48 B per
    * edge — 1 GB at the 20M-row default cutoff. */
  private[operators] def boruvkaTail(ec: DataFrame, startRound: Int): DataFrame = {
    val spark = ec.sparkSession
    import spark.implicits._
    ec.select(col("ca"), col("cb"), col("wu"), col("a"), col("b"), col("w"))
      .as[(Long, Long, Long, Long, Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        // primitive columns, not an Array[Tuple6] (Tuple6 boxes all
        // six longs — 3× the heap at the cutoff bound)
        val caB = Array.newBuilder[Long]; val cbB = Array.newBuilder[Long]
        val wuB = Array.newBuilder[Long]; val aB = Array.newBuilder[Long]
        val bB = Array.newBuilder[Long]; val wB = Array.newBuilder[Long]
        it.foreach { case (ca, cb, wu, a, b, w) =>
          caB += ca; cbB += cb; wuB += wu; aB += a; bB += b; wB += w
        }
        val ca = caB.result(); val cb = cbB.result(); val wu = wuB.result()
        val ea = aB.result(); val eb = bB.result(); val ew = wB.result()
        val n = ca.length
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
        var round = startRound
        var moving = true
        while (round <= MsfRounds && moving) {
          // per-component min-wu live edge (root -> edge index)
          val best = scala.collection.mutable.LongMap.empty[Int]
          var i = 0
          while (i < n) {
            val ra = find(ca(i)); val rb = find(cb(i))
            if (ra != rb) {
              val curA = best.getOrElse(ra, -1)
              if (curA < 0 || wu(curA) > wu(i)) best(ra) = i
              val curB = best.getOrElse(rb, -1)
              if (curB < 0 || wu(curB) > wu(i)) best(rb) = i
            }
            i += 1
          }
          if (best.isEmpty) moving = false
          else {
            // distinct picked edges (a mutual pick is the same index)
            val picks = new java.util.TreeSet[Integer]()
            best.valuesIterator.foreach(picks.add(_))
            val pit = picks.iterator()
            while (pit.hasNext) {
              val idx: Int = pit.next()
              out += ((round.toLong, ea(idx), eb(idx), ew(idx)))
              val ra = find(ca(idx)); val rb = find(cb(idx))
              if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
            }
            round += 1
          }
        }
        out.iterator
      }
      .toDF("round", "src", "dst", "w")
  }
}
