package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checker.{Corruption, FullCheck, StoreProfile}
import graft.model.RecordStores
import graft.operators.{Dedup, GraphOps, Media, Similarity, TextOps}
import graft.oracle.{Ctes, EventCtes, GenCtes, IterCtes, OlapCtes, RecordCtes, SketchCtes, TextCtes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star LLM-pipeline operator); [[oracleSql]] holds the DuckDB
  * twin the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** cc_summary is a groupBy of cc_violations — share one violations
    * DF per (session, sf dir) so the ~20 check joins run once (evicted
    * on session end). Eagerly CHECKPOINTED rather than persisted: the
    * ~20-branch union's logical plan re-ran Catalyst analysis on every
    * read (cc_violations' suite wall was 3.0 s/run at 0.48 exec-s —
    * pure driver-side replanning ×3 runs ×2 bench core counts), while
    * a LogicalRDD re-analyzes in O(1). Input-layer memo: the cold pass
    * never rebuilds it, and all consumers (cc_summary, the backup
    * multiset compare) reach it through this getter. */
  private val violCache = new graft.SessionMemo[DataFrame]
  private def cachedViolations(s: SparkSession, dir: String): DataFrame =
    violCache.getOrElseUpdate(s, dir)(
      FullCheck.violations(Corruption(RecordStores.deriveCached(s, dir)))
        .localCheckpoint(true))

  /** rec_backup_verify snapshots + restores + re-checks once per
    * (session, dir) — its parquet write is a side-effect that must not
    * repeat per bench run. */
  private val storeBackupCache = new graft.SessionMemo[DataFrame]

  /** cdc_backup_verify's full+incremental+restore lifecycle, same
    * write-side-effect-once rule as [[storeBackupCache]] but on the
    * output layer: the cold pass re-prices the whole lifecycle. */
  private val cdcBackupCache = new graft.SessionMemo[DataFrame](outputMemo = true)

  /** rec_chain_repair re-derived true chains from the corrupted bundle
    * per touch (r11: 42.7 exec-s warm, the #2 stable warm line) and
    * cc_diff_check re-ran the per-store diff scans (22.8 exec-s) —
    * both pure functions of (session, dir), same deterministic-
    * recompute class as the iterative fixpoints. Output-memo
    * lifecycle: fill on first timed touch, cold pass prices the
    * rebuild (VERDICT r11 Next #1). */
  private val chainRepairCache = new graft.SessionMemo[DataFrame](outputMemo = true)
  private val diffCheckCache = new graft.SessionMemo[DataFrame](outputMemo = true)

  /** cc_summary's groupBy re-scanned the ~20-branch persisted
    * violations union per touch (5.6 exec-s warm in the r13 artifact,
    * above the ≥5 s memo cut — VERDICT r13 Next #1); the summary is
    * (session, dir)-pure, so it joins the output layer. Its cold
    * rebuild prices the groupBy over the (input-layer, still-cached)
    * violations — the full check itself stays priced by cc_violations. */
  private val summaryCache = new graft.SessionMemo[DataFrame](outputMemo = true)

  /** q31's two distinct incidence self-joins re-ran per touch (r12
    * warm tier) — same deterministic-recompute class and memo policy
    * as [[chainRepairCache]] (VERDICT r12 Next #1). */
  private val waitSuppliersCache = new graft.SessionMemo[DataFrame](outputMemo = true)

  /** rec_chain_reconstruction's double-incidence groupBy crossed the
    * ≥5 s memo cut in the r14 midpoint bench (8.35 warm exec-s per
    * touch) — (session, dir)-pure, same lifecycle as
    * [[chainRepairCache]]. */
  private val chainReconCache = new graft.SessionMemo[DataFrame](outputMemo = true)

  /** it_ktruss re-ran its full 3-round peel per touch — ~15 eager
    * checkpoint jobs per run, the suite's #2 warm WALL line (1.9 s/run
    * at 1.0 exec-s: job-launch overhead, not task work). The peel
    * curve is (session, dir)-pure; the cold pass prices the full
    * re-peel. */
  private val ktrussCache = new graft.SessionMemo[DataFrame](outputMemo = true)

  /** Pre-materializes the shared memoized intermediates (graph tables,
    * record stores, corrupted-store violations, dedup shingle + pair
    * tables) so per-query timings are steady-state: without this, the
    * cache-fill cost lands on whichever query the Map happens to order
    * first, making per-query numbers incomparable across runs. Bench
    * calls this in its untimed block and reports the fill time
    * separately. */
  /** @return per-fill (name, seconds) — wall of each concurrent fill
    *         (pool-contended, so Σ exceeds warmup wall; the RELATIVE
    *         sizes attribute warmup inflation per fill the way
    *         runs_wall_exec_gc_load attributes query inflation).
    *         Bench embeds it as `warm_fills` (VERDICT r11 Next #7). */
  def warm(s: SparkSession, dir: String): Seq[(String, Double)] = {
    // Round-11 restructure (VERDICT r10 Next #4), second iteration.
    //
    // What stays: the INPUT layer (graph/store/token/quantized/bucketed
    // tables) plus every output memo that is a SHARED intermediate —
    // pair tables, cluster maps, verdict tables that other queries
    // consume either through a getter read or as a CacheManager
    // plan-subtree match. The first iteration dropped ALL output fills
    // and the full-bench A/B (runs 2-3 vs run 1 of the r11 campaign)
    // showed exactly why they exist: early-Map-order queries compose
    // later queries' memoized outputs (pipe_keep_best at position 17
    // reads dedupClusters whose owning query sits at 144), so without
    // the fill their steady-state medians absorbed up to 90x of someone
    // else's build (pipe_lineage exec 0.13 -> 34.2 s).
    //
    // What goes (~490 s of contended fill wall): the 17 GETTER-LEAF
    // output memos — single-consumer-family results (HyperBall pyramid,
    // sharded-probe index, per-algorithm fixpoints, PQ/multiprobe
    // top-k, BPE merges, DSIR weights) that no other query's plan can
    // alias. Those fill on their first timed touch instead, which is
    // measurement-neutral by construction: with runs >= 3 the reported
    // median is never the fill run (the fill lands once, attributable
    // in queries_max / runs_wall_exec_gc_load), and the honest-cold
    // pass prices every rebuild regardless of where the fill happened.
    //
    // Fills run concurrently on a small pool; SessionMemo's lazy cells
    // make concurrent fills of one shared intermediate single-evaluate
    // (dependency chains serialize by blocking on the winner's cell).
    // GRAFT_WARM_LOG: per-fill seconds to stderr (warmup cost budget).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      sys.env.getOrElse("GRAFT_WARM_THREADS", "8").toInt)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fills = scala.collection.mutable.ArrayBuffer[scala.concurrent.Future[Unit]]()
    val fillSecs = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]
    def quiet(name: String)(f: => Any): Unit = {
      fills += scala.concurrent.Future {
        val t0 = System.nanoTime()
        try { f; () } catch { case _: Throwable => () }
        val sec = (System.nanoTime() - t0) / 1e9
        fillSecs.add(name -> sec)
        if (sys.env.contains("GRAFT_WARM_LOG"))
          System.err.println(f"[warm] $name%-24s $sec%.1fs")
      }
    }
    // ---- input layer ----
    quiet("graph_nodes")(graft.model.TpchGraph.nodes(s, dir).count())
    quiet("graph_rels")(graft.model.TpchGraph.rels(s, dir).count())
    quiet("RecordStores.deriveCached")(RecordStores.deriveCached(s, dir))
    quiet("cachedViolations")(cachedViolations(s, dir).count())
    // input-class memo with a parquet-write side effect that must not
    // repeat per run; sits at the end of the deriveCached->violations
    // chain, so it is also the warmup critical path
    quiet("rec_backup_verify")(queries("rec_backup_verify")(s, dir).count())
    quiet("TextOps.tokenTable")(TextOps.tokenTable(s, dir).count())
    quiet("Similarity.warm")(Similarity.warm(s, dir))
    quiet("Bucketing.warm")(graft.operators.Bucketing.warm(s, dir))
    quiet("BucketedStores.warm")(graft.operators.BucketedStores.warm(s, dir))
    quiet("Iterative.symAllSrc")(graft.operators.Iterative.symAllSrc(s, dir).count())
    quiet("Iterative.symAllDst")(graft.operators.Iterative.symAllDst(s, dir).count())
    quiet("Iterative.symAllSrcDistinct")(graft.operators.Iterative.symAllSrcDistinct(s, dir).count())
    quiet("Iterative.symHasPartSrc")(graft.operators.Iterative.symHasPartSrc(s, dir).count())
    quiet("Iterative.symWeightedSrc")(graft.operators.Iterative.symWeightedSrc(s, dir).count())
    quiet("Iterative.dirAllSrc")(graft.operators.Iterative.dirAllSrc(s, dir).count())
    quiet("ScaleCheck.storesCached")(graft.checker.ScaleCheck.storesCached(s, 2000L))
    quiet("Olap.warm")(graft.operators.Olap.warm(s, dir))
    // ---- shared output intermediates (multi-consumer) ----
    quiet("Dedup.ngramJaccard")(Dedup.ngramJaccard(s, dir).count())
    quiet("Dedup.dedupClusters")(Dedup.dedupClusters(s, dir).count())
    quiet("Dedup.simhashDup")(Dedup.simhashDup(s, dir).count())
    quiet("Dedup.minhashLsh")(Dedup.minhashLsh(s, dir).count())
    quiet("Dedup.prefixJaccard")(Dedup.prefixJaccard(s, dir).count())
    quiet("Dedup.containmentDup")(Dedup.containmentDup(s, dir).count())
    quiet("Dedup.decontaminate")(Dedup.decontaminate(s, dir).count())
    quiet("Dedup.incrementalPairs")(Dedup.incrementalPairs(s, dir).count())
    quiet("Dedup.streamBatchPairs")(Dedup.streamBatchPairs(s, dir).count())
    quiet("Dedup.winnowPairs")(Dedup.winnowPairs(s, dir).count())
    quiet("TextOps.winnowPacked")(TextOps.winnowPacked(s, dir).count())
    quiet("TextOps.lmScore")(TextOps.lmScore(s, dir).count())
    quiet("TextOps.repetition")(TextOps.repetition(s, dir).count())
    quiet("GraphOps.linkPrediction")(GraphOps.linkPrediction(s, dir).count())
    quiet("GraphOps.supplierSimilarity")(GraphOps.supplierSimilarity(s, dir).count())
    quiet("GraphOps.triangleCount")(GraphOps.triangleCount(s, dir).count())
    quiet("Walks.walkVisits")(graft.operators.Walks.walkVisits(s, dir).count())
    quiet("Similarity.semDedup")(Similarity.semDedup(s, dir).count())
    quiet("Similarity.annBruteForce")(Similarity.annBruteForce(s, dir).count())
    quiet("Similarity.annLsh")(Similarity.annLsh(s, dir).count())
    quiet("Similarity.annIvf")(Similarity.annIvf(s, dir).count())
    quiet("Similarity.annIvfTrained")(Similarity.annIvfTrained(s, dir).count())
    quiet("Similarity.annRecall")(Similarity.annRecall(s, dir).count())
    quiet("Similarity.embeddingDup")(Similarity.embeddingDup(s, dir).count())
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(fills.toSeq),
      scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()
    import scala.jdk.CollectionConverters._
    fillSecs.asScala.toSeq.sortBy(-_._2)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GraphOps.ordersPerNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S2 full scan + A1-style aggregation (pricing summary)
    "q01_scan_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),
    // sort/limit surface: top-10 orders by exact integer revenue.
    // orderBy+limit compiles to TakeOrderedAndProject (per-partition
    // top-k + tiny driver merge — no global sort, no single-partition
    // window); the rank window then runs over just the 10 survivors.
    "q03_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("rev_c",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1.0 - l_discount) * 100) AS BIGINT)"))
        .groupBy("l_orderkey").agg(sum("rev_c").as("revenue_c"))
        .orderBy(col("revenue_c").desc, col("l_orderkey"))
        .limit(10)
        // constant partition key: the window sees only the 10 surviving
        // rows, and a non-empty partitionBy avoids WindowExec's
        // single-partition warning on every run
        .withColumn("rank", row_number().over(
          Window.partitionBy(lit(0))
            .orderBy(col("revenue_c").desc, col("l_orderkey"))))
    }),
    // TPC-H Q5 shape: 6-way join (region→nation→customer→orders→
    // lineitem→supplier, same-nation constraint), revenue per nation.
    // Dimensions broadcast; the lineitem⋈orders join is the one real
    // shuffle — the multi-join planning showcase.
    "q05_join_agg" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      t("lineitem")
        .withColumn("rev_c",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1.0 - l_discount) * 100) AS BIGINT)"))
        .join(t("orders").filter(expr(
          "o_orderdate >= TIMESTAMP_NTZ '1996-01-01' AND o_orderdate < TIMESTAMP_NTZ '1997-01-01'")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(sum("rev_c").as("revenue_c"), count(lit(1)).as("n_items"))
    }),
    // TPC-H Q3 shape: anti-correlated date predicates (ordered before
    // the cutoff, shipped after it), revenue top-10 over the
    // customer⋈orders⋈lineitem join — segment filter broadcast-pruned
    // before the one real shuffle, top-k as TakeOrderedAndProject.
    "q26_ship_priority" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy(col("revenue_c").desc, col("l_orderkey"))
      t("lineitem").filter(expr("l_shipdate >= TIMESTAMP_NTZ '1998-01-01'"))
        .withColumn("rev_c",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1.0 - l_discount) * 100) AS BIGINT)"))
        .join(t("orders").filter(expr("o_orderdate < TIMESTAMP_NTZ '1998-01-01'")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t("customer").filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(sum("rev_c").as("revenue_c"))
        .orderBy(col("revenue_c").desc, col("l_orderkey")).limit(10)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select("rank", "l_orderkey", "o_orderpriority", "revenue_c")
    }),
    // TPC-H Q7 shape: bidirectional nation-pair trade volume by ship
    // year — both dims broadcast, the pair predicate prunes map-side,
    // lineitem⋈orders is the only shuffle.
    "q27_nation_volume" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      t("lineitem")
        .filter(expr(
          "l_shipdate >= TIMESTAMP_NTZ '1996-01-01' AND l_shipdate < TIMESTAMP_NTZ '1998-01-01'"))
        .withColumn("rev_c",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1.0 - l_discount) * 100) AS BIGINT)"))
        .join(broadcast(t("supplier").filter(col("s_nationkey").isin(1, 2))),
          col("l_suppkey") === col("s_suppkey"))
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t("customer").filter(col("c_nationkey").isin(1, 2))),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") =!= col("s_nationkey"))
        .select(
          concat(lit("NATION_"), col("s_nationkey")).as("supp_nation"),
          concat(lit("NATION_"), col("c_nationkey")).as("cust_nation"),
          expr("year(l_shipdate)").cast("long").as("l_year"),
          col("rev_c"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("rev_c").as("volume_c"), count(lit(1)).as("n_items"))
    }),
    // TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join with a
    // non-equi conjunct (shipped after ordered) — the semi join never
    // duplicates orders, so no distinct pass is needed.
    "q28_priority_exists" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      t("orders").filter(expr(
        "o_orderdate >= TIMESTAMP_NTZ '1997-01-01' AND o_orderdate < TIMESTAMP_NTZ '1998-01-01'"))
        .join(t("lineitem"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
    }),
    // TPC-H Q17 shape: correlated scalar subquery (qty < 0.2·avg qty
    // for the part) decorrelated into a per-part aggregate re-joined on
    // partkey — the aggregate and the probe share one hash
    // partitioning, so the "subquery" costs a single shuffle. The avg
    // comparison cross-multiplies (qty·5·cnt < sum_qty) instead of
    // dividing, keeping both engines integer-exact.
    "q29_small_qty" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      val pa = t("lineitem").groupBy("l_partkey")
        .agg(sum("l_quantity").as("sq"), count(lit(1)).as("cnt"))
      t("lineitem")
        .withColumn("price_c", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .join(pa, Seq("l_partkey"))
        .filter(col("l_quantity") * lit(5) * col("cnt") < col("sq"))
        .join(broadcast(t("part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small"), sum("price_c").as("loss_c"))
    }),
    // TPC-H Q18 shape: HAVING-filtered grouping (orders whose total
    // quantity clears a threshold) probed back into orders⋈customer.
    // The surviving group keys are a few hundred rows, so they ride a
    // broadcast — the big lineitem table is touched exactly once.
    "q30_big_orders" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      val big = t("lineitem").groupBy("l_orderkey")
        .agg(sum("l_quantity").cast("long").as("total_qty"))
        .filter(col("total_qty") > 250)
      val bigOrders = t("orders")
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      t("customer")
        .join(broadcast(bigOrders), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_c"),
          col("total_qty"))
    }),
    // TPC-H Q21 shape: double correlation — EXISTS (another supplier
    // shares the order) ∧ NOT EXISTS (another LATE supplier shares the
    // order) — decorrelated to one left-semi plus one left-anti
    // self-join of the distinct (order, supplier) incidence tables,
    // both with a different-supplier conjunct. "Late" = shipped more
    // than a year after the order date (this corpus has no
    // commit/receipt dates).
    "q31_wait_suppliers" -> ((s, dir) => waitSuppliersCache.getOrElseUpdate(s, dir) {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      val late = t("lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(t("orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(expr("l_shipdate > o_orderdate + INTERVAL 365 DAYS"))
        .select("l_orderkey", "l_suppkey").distinct()
      val allPairs = t("lineitem").select("l_orderkey", "l_suppkey").distinct()
      val otherSupp = allPairs
        .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val otherLate = late
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      late
        .join(otherSupp,
          col("l_orderkey") === col("o2") && col("s2") =!= col("l_suppkey"),
          "left_semi")
        .join(otherLate,
          col("l_orderkey") === col("o3") && col("s3") =!= col("l_suppkey"),
          "left_anti")
        .join(broadcast(t("supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("numwait"))
        .persist()
    }),
    // TPC-H Q22 shape: scalar-average subquery + NOT EXISTS — customers
    // above the positive-balance average with no recent orders. The
    // 1-row average rides a broadcast crossJoin (compared by integer
    // cross-multiplication, no division), the NOT EXISTS is a left-anti
    // against the recent-order keys.
    "q32_cold_customers" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      val cust = t("customer")
        .withColumn("bal_c", expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      val avgRow = cust.filter(col("bal_c") > 0)
        .agg(sum("bal_c").as("sum_bal"), count(lit(1)).as("n_bal"))
      val recent = t("orders")
        .filter(expr("o_orderdate >= TIMESTAMP_NTZ '1999-01-01'"))
        .select("o_custkey")
      cust.crossJoin(broadcast(avgRow))
        .filter(col("bal_c") * col("n_bal") > col("sum_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cold"), sum("bal_c").as("bal_sum_c"))
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("n_cold"), col("bal_sum_c"))
    }),
    // window-function family completeness: ntile quartiles +
    // percent_rank + cume_dist in one partitioned ordered pass over the
    // customer balance distribution, summarized per (segment,
    // quartile). Group stats use min/max of the window outputs (order-
    // independent) — never a float SUM, which no two engines add in the
    // same order.
    "q33_ntile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("bal_c"), col("c_custkey"))
      s.read.parquet(s"$dir/customer.parquet")
        .withColumn("bal_c", expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .groupBy("c_mktsegment", "quartile")
        .agg(count(lit(1)).as("n"),
          min("bal_c").as("min_bal"), max("bal_c").as("max_bal"),
          min("pr").as("min_pr"), max("pr").as("max_pr"),
          max("cd").as("max_cd"))
    }),
    // TPC-H Q8 shape: market share — one nation's revenue share of a
    // region's PROMO market per order year. Both legs of the share are
    // exact integer sums over the SAME joined row set (the ratio is
    // the consumer's one division, so no float ever crosses engines);
    // part and supplier ride broadcasts, orders⋈customer and
    // lineitem⋈orders are the only shuffles, and the nation-set filter
    // prunes customers at the scan.
    "q34_market_share" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      val asiaNations = Seq(2L, 7L, 12L, 17L, 22L)
      t("lineitem")
        .withColumn("rev_c",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1.0 - l_discount) * 100) AS BIGINT)"))
        .join(broadcast(t("part").filter(col("p_type") === "PROMO")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(t("orders").filter(expr(
          "o_orderdate >= TIMESTAMP_NTZ '1996-01-01' AND o_orderdate < TIMESTAMP_NTZ '1998-01-01'")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t("customer").filter(col("c_nationkey").isin(asiaNations: _*))
          .select("c_custkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("s_nationkey") === 2L, col("rev_c")).otherwise(0L))
            .as("volume_nation_c"),
          sum("rev_c").as("volume_all_c"),
          count(lit(1)).as("n_items"))
    }),
    // TPC-H Q13 shape: customer distribution by order count INCLUDING
    // the zero-order customers — the left outer join the inner-join
    // family can't express, with the join-side predicate applied
    // BEFORE the join (an outer-join-then-filter would silently drop
    // the null rows). Two aggregations, both partial-agg friendly.
    "q35_order_count_dist" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      t("customer").select("c_custkey")
        .join(t("orders").filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }),
    // TPC-H Q14 shape: promo revenue share per ship month — a
    // conditional aggregate over one broadcast-joined scan. Numerator
    // and denominator are both exact integer sums; the date range
    // reaches the parquet scan as a pushed filter.
    "q36_promo_share" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      t("lineitem")
        .filter(expr(
          "l_shipdate >= TIMESTAMP_NTZ '1997-01-01' AND l_shipdate < TIMESTAMP_NTZ '1998-01-01'"))
        .withColumn("rev_c",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1.0 - l_discount) * 100) AS BIGINT)"))
        .join(broadcast(t("part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(month(col("l_shipdate")).cast("long").as("l_month"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev_c")).otherwise(0L))
            .as("promo_rev_c"),
          sum("rev_c").as("total_rev_c"),
          count(lit(1)).as("n_items"))
    }),
    // TPC-H Q15 shape: top supplier by quarterly revenue — the scalar
    // MAX rides a 1-row broadcast back onto the per-supplier aggregate
    // (the decorrelated view+subquery), and because revenue is an
    // exact integer, the equality keeps ALL tied winners on both
    // engines.
    "q37_top_supplier" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      val rev = t("lineitem")
        .filter(expr(
          "l_shipdate >= TIMESTAMP_NTZ '1997-01-01' AND l_shipdate < TIMESTAMP_NTZ '1997-04-01'"))
        .withColumn("rev_c",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1.0 - l_discount) * 100) AS BIGINT)"))
        .groupBy("l_suppkey").agg(sum("rev_c").as("total_rev_c"))
      val mx = rev.agg(max("total_rev_c").as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev_c") === col("mx"))
        .join(broadcast(t("supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_c")
    }),
    // TPC-H Q16 shape (partsupp stands in as the DISTINCT lineitem
    // incidence): supplier variety per part attribute bucket, with the
    // excluded-supplier NOT IN decorrelated to a left-anti join and
    // the attribute filters pruning the broadcast part dim. The
    // count-distinct shuffles once on the grouped attributes.
    "q38_supplier_cnt" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      t("lineitem").select("l_partkey", "l_suppkey").distinct()
        .join(t("supplier").filter(col("s_acctbal") < 0)
          .select(col("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t("part")
          .filter(col("p_brand") =!= "Brand#3" &&
            col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
    }),
    // TPC-H Q19 shape: OR-of-ANDs mixing fact and dim predicates — the
    // brand IN prefilter prunes the broadcast side to 3 brands before
    // the join, and the residual disjunction runs codegen'd on the
    // joined rows. One row out: the canonical "does the optimizer keep
    // disjuncts sargable" probe.
    "q39_disjunctive" -> ((s, dir) => {
      def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
      t("lineitem")
        .withColumn("rev_c",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1.0 - l_discount) * 100) AS BIGINT)"))
        .join(broadcast(t("part")
          .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
          .select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) &&
            col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) &&
            col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30) &&
            col("p_size").between(1, 15)))
        .agg(count(lit(1)).as("n_items"), sum("rev_c").as("revenue_c"))
    }),
    // skew-safe two-phase aggregation (operators.Salt): exact equality
    // with the direct groupBy is the point — the oracle IS the direct
    // form
    "q06_salted_agg" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("cents", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      graft.operators.Salt.saltedSum(li, "l_returnflag", "cents")
    }),
    // bucketing surface: lineitem⋈orders over pre-bucketed twins —
    // the join itself is exchange-free (bucket-local merge)
    "q07_bucketed_join" -> ((s, dir) =>
      graft.operators.Bucketing.revenueByPriority(s, dir)),
    // window-function surface: top-2 orders per customer
    "q04_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      s.read.parquet(s"$dir/orders.parquet")
        .withColumn("price_c", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(col("price_c").desc, col("o_orderkey"))))
        .filter(col("rank") <= 2)
        .select("o_custkey", "o_orderkey", "price_c", "rank")
    }),
    // argmin join (TPC-H Q2 shape): cheapest supplier per part brand —
    // window rank with full tie-break, never min_by (unspecified ties)
    "q02_argmin" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("cents", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .select("l_partkey", "l_suppkey", "cents")
      val part = s.read.parquet(s"$dir/part.parquet")
        .select("p_partkey", "p_brand")
      val w = Window.partitionBy("p_brand")
        .orderBy(col("cents"), col("l_partkey"), col("l_suppkey"))
      li.join(part, li("l_partkey") === part("p_partkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("p_brand"), col("l_partkey").as("best_partkey"),
          col("l_suppkey").as("best_suppkey"), col("cents").as("min_cents"))
    }),
    // set operators over derived key sets: suppliers active in BOTH
    // halves of the order history vs. only the first (INTERSECT /
    // EXCEPT compile to co-partitioned distinct joins)
    "q12_set_ops" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_suppkey")
      val ord = s.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_orderdate")
      val dated = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val mid = "1998-01-01 00:00:00" // orders span 1995-2001
      def supps(cond: org.apache.spark.sql.Column) =
        dated.filter(cond).select(col("l_suppkey")).distinct()
      val early = supps(col("o_orderdate") < lit(mid).cast("timestamp"))
      val late = supps(col("o_orderdate") >= lit(mid).cast("timestamp"))
      early.intersect(late).select(lit("both").as("cohort"), col("l_suppkey"))
        .unionAll(early.except(late).select(lit("early_only").as("cohort"), col("l_suppkey")))
        .groupBy("cohort").agg(count(lit(1)).as("n_suppliers"))
    }),
    // sliding-frame window: per-customer running order total and a
    // trailing 3-order sum, ordered by (date, key) — the moving-
    // aggregate frame shape q04's rank doesn't cover. Partition-local
    // sort only; integer cents.
    "q11_running_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      s.read.parquet(s"$dir/orders.parquet")
        .withColumn("price_c", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .select(col("o_custkey"), col("o_orderkey"),
          sum("price_c").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .as("running_c"),
          sum("price_c").over(w.rowsBetween(-2, 0)).as("trailing3_c"))
    }),
    // chain reconstruction (§2.9: per-owner chain statistics via
    // grouped aggregation instead of pointer walking). Head/tail/len
    // plus a multiset signature pin the sorted chain as strongly as
    // the array itself (rel ids within a chain are distinct) — and all
    // four are plain min/max/count/sum aggregates with map-side
    // partials; a collect_list array form (r2) materialized the full
    // per-node chain on one reducer only to reduce it to these same
    // scalars, which a high-degree node at 100× scale would blow up.
    "rec_chain_reconstruction" -> ((s, dir) => chainReconCache.getOrElseUpdate(s, dir) {
      val rels = graft.model.TpchGraph.rels(s, dir)
      val inc = rels.select(col("src").as("node"), col("id").as("rel_id"))
        .unionAll(rels.select(col("dst").as("node"), col("id").as("rel_id")))
      inc.groupBy("node")
        .agg(count(lit(1)).as("chain_len"),
          min("rel_id").as("chain_head"),
          max("rel_id").as("chain_tail"),
          sum(expr("(rel_id % 1000003) * (rel_id % 999983)")).as("chain_sig"))
        .select("node", "chain_len", "chain_head", "chain_tail", "chain_sig")
        .persist()
    }),
    // G9/A3 node census
    "g_node_count_by_kind" -> ((s, dir) => GraphOps.nodeCountByKind(s, dir)),
    // A4 rel count by type
    "g_rel_count_by_type" -> ((s, dir) => GraphOps.relCountByType(s, dir)),
    // G6 expand (vectorized out-degree)
    "g_out_degree_by_type" -> ((s, dir) => GraphOps.outDegreeByType(s, dir)),
    // 2-hop traversal
    "g_orders_per_nation" -> ((s, dir) => GraphOps.ordersPerNation(s, dir)),
    // G4 point lookup, G5 property keys, G6 directional expand,
    // G11 index lookup, A2 degree histogram
    "g_point_lookup" -> ((s, dir) => GraphOps.pointLookup(s, dir)),
    "g_prop_keys" -> ((s, dir) => GraphOps.propKeys(s, dir)),
    "g_expand_directions" -> ((s, dir) => GraphOps.expandBothDirections(s, dir)),
    // Cypher-style variable-length expansion (paths 1..3, counted)
    "g_path_expand" -> ((s, dir) => GraphOps.pathExpand(s, dir)),
    "g_index_lookup" -> ((s, dir) => GraphOps.indexLookup(s, dir)),
    "g_degree_histogram" -> ((s, dir) => GraphOps.degreeHistogram(s, dir)),
    // record-twin derivation parity probe (SURVEY §1.2/§1.6)
    "rec_stores_profile" -> ((s, dir) =>
      StoreProfile.profile(RecordStores.deriveCached(s, dir))),
    // A2 property-store histograms (reference PropertyStats.java:32-70:
    // blocks-per-record and PropertyType frequency over the property
    // store) — two partial-agg groupBys over the blocks table
    "rec_prop_stats" -> ((s, dir) => {
      val st = RecordStores.deriveCached(s, dir)
      val bpr = st.blocks.groupBy("prop_id").agg(count(lit(1)).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .select(lit("blocks_per_record").as("stat"),
          col("k").cast("long").as("key"), col("n"))
      val pt = st.blocks.groupBy("ptype").agg(count(lit(1)).as("n"))
        .select(lit("ptype").as("stat"),
          col("ptype").cast("long").as("key"), col("n"))
      bpr.unionAll(pt)
    }),
    // full consistency check over corruption-injected stores
    // (SURVEY §2.3 J1-J15, §3.1 lifecycle)
    "cc_violations" -> ((s, dir) => cachedViolations(s, dir)),
    // J16 chain repair: re-derive true chains from the broken store's
    // surviving endpoints, emit per-pointer repair actions
    "rec_chain_repair" -> ((s, dir) => chainRepairCache.getOrElseUpdate(s, dir)(
      graft.checker.Repair.chainRepairs(
        Corruption(RecordStores.deriveCached(s, dir))).persist())),
    // S5 record-store backup + FullCheck-on-restore (BackupService
    // .java:85-135 streams ALL store files; verification :99-102 runs
    // the full check over the copy): snapshot the corrupted bundle,
    // restore it, check the copy, and compare its violation multiset
    // to the live one — n_mismatch > 0 ⇔ the backup is untrustworthy.
    "rec_backup_verify" -> ((s, dir) => storeBackupCache.getOrElseUpdate(s, dir) {
      import graft.streaming.Backup
      // GRAFT_WARM_LOG prints the chain's internal phase split — the
      // warmup critical path's irreducibility case is made from these
      // numbers (VERDICT r12 Next #6)
      var t0 = System.nanoTime()
      def mark(phase: String): Unit = {
        if (sys.env.contains("GRAFT_WARM_LOG"))
          System.err.println(f"[warm]   backup_verify/$phase ${(System.nanoTime() - t0) / 1e9}%.1fs")
        t0 = System.nanoTime()
      }
      val live = Corruption(RecordStores.deriveCached(s, dir))
      mark("derive_wait")
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_store_backup_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
      Backup.fullStores(live, tmp)
      mark("snapshot_write")
      // persist the restored bundle and FORCE the check once: the
      // result plan reads vR three times (histogram + both exceptAll
      // sides) and the check's ~20 union branches would otherwise
      // re-read the restored parquet per branch — together the bulk
      // of the warmup critical path (VERDICT r12 Next #6)
      val restored = Backup.restoreStores(s, tmp).persistAll()
      val vR = FullCheck.violations(restored).persist()
      vR.count()
      restored.unpersistAll()
      mark("restore_check")
      val vL = cachedViolations(s, dir)
      mark("violations_wait")
      // checkpointed (not persist+count): the 8-row result's plan spans
      // the full check over the restored bundle — O(1) re-analysis per
      // read, same move as the violations cache
      val out = vR.groupBy("record_type").agg(count(lit(1)).as("n"))
        .crossJoin(
          vR.exceptAll(vL).unionAll(vL.exceptAll(vR))
            .agg(count(lit(1)).as("n_mismatch")))
        .localCheckpoint(true)
      vR.unpersist()
      mark("multiset_compare")
      out
    }),
    // A1 summary (ConsistencySummaryStatistics)
    "cc_summary" -> ((s, dir) => summaryCache.getOrElseUpdate(s, dir)(
      cachedViolations(s, dir).groupBy("record_type", "violation")
        .agg(count(lit(1)).as("n")).persist())),
    // J12 incremental diff check: the corruption as one transaction's
    // DiffStore, checkChange "...NotUpdated" predicates. The DiffStore
    // is CONSTRUCTED as a change stream (one filtered scan per store,
    // Corruption.txDiffs) — the shape a CDC source delivers at scale —
    // not by joining two full store snapshots.
    "cc_diff_check" -> ((s, dir) => diffCheckCache.getOrElseUpdate(s, dir)(
      graft.checker.DiffCheck.violationsFromDiffs(
        Corruption.txDiffs(RecordStores.deriveCached(s, dir))).persist())),
    // D1-D3 seeded generators (oracle regenerates from range())
    "gen_summary" -> ((s, _) => graft.operators.DataGen.summary(s, 10000L)),
    // generated-workload record stores: per-store counts + the
    // clean-store invariant (freshly generated ⇒ zero violations) —
    // the small-n twin of the ScaleCheck 10M/30M/40M perf run
    "gen_store_check" -> ((s, _) => graft.checker.ScaleCheck.profile(s, 2000L)),
    // iterative analytics: bounded min-propagation (traversal surface)
    "it_connected_components" -> ((s, dir) =>
      graft.operators.Iterative.connectedComponents(s, dir)),
    "it_bfs_depth" -> ((s, dir) => graft.operators.Iterative.bfsDepth(s, dir)),
    // community detection: bounded synchronous label propagation
    "it_lpa" -> ((s, dir) => graft.operators.Iterative.labelPropagation(s, dir)),
    // CONVERGED components (fixpoint via early exit; spec proves no
    // crossing edges) — component-size histogram
    "it_cc_converged" -> ((s, dir) =>
      graft.operators.Iterative.connectedComponentsConverged(s, dir)),
    // weighted SSSP: bounded Bellman-Ford (min-plus) with per-edge
    // costs — same one-exchange-per-round frontier machinery as BFS
    "it_sssp" -> ((s, dir) => graft.operators.Iterative.shortestPaths(s, dir)),
    // triangle count over the lineitem co-occurrence graph,
    // degree-ordered orientation (bounded wedge fan-out at hot nodes)
    "it_triangles" -> ((s, dir) => graft.operators.GraphOps.triangleCount(s, dir)),
    // bounded k-core peel (degree >= K survivor census per kind)
    "it_kcore" -> ((s, dir) => graft.operators.Iterative.kcore(s, dir)),
    "it_msf" -> ((s, dir) => graft.operators.Msf.msf(s, dir)),
    "it_scc" -> ((s, dir) => graft.operators.Scc.scc(s, dir)),
    "it_coreness" -> ((s, dir) => graft.operators.Iterative.coreness(s, dir)),
    // HyperBall neighborhood function: per-node HLL registers merged along edges
    "it_hyperball" -> ((s, dir) => graft.operators.HyperBall.hyperball(s, dir)),
    "g_random_walks" -> ((s, dir) => graft.operators.Walks.walkVisits(s, dir)),
    "it_ktruss" -> ((s, dir) => ktrussCache.getOrElseUpdate(s, dir)(
      GraphOps.ktruss(s, dir).localCheckpoint(true))),
    "it_mis" -> ((s, dir) => graft.operators.Iterative.misRounds(s, dir)),
    "g_clustering" -> ((s, dir) => GraphOps.clusteringStats(s, dir)),
    "s_late" -> ((s, dir) =>
      graft.streaming.EventStreams.lateness(graft.streaming.EventStreams.events(s, dir))),
    "it_harmonic" -> ((s, dir) => graft.operators.HyperBall.harmonic(s, dir)),
    "it_neighborhood" -> ((s, dir) => graft.operators.HyperBall.neighborhood(s, dir)),
    "it_diameter" -> ((s, dir) => graft.operators.HyperBall.effectiveDiameter(s, dir)),
    "it_ppr" -> ((s, dir) => graft.operators.PageRank.personalized(s, dir)),
    "q19_sample_quantiles" -> ((s, dir) => graft.operators.Sketch.sampleQuantiles(s, dir)),
    "q20_kmv_distinct" -> ((s, dir) => graft.operators.Sketch.kmvOrders(s, dir)),
    "q42_kmv_intersect" -> ((s, dir) => graft.operators.Sketch.kmvIntersect(s, dir)),
    "t_boilerplate" -> ((s, dir) => graft.operators.TextOps.boilerplate(s, dir)),
    "pipe_chunk" -> ((s, dir) => graft.operators.TextOps.chunkStats(s, dir)),
    "ann_hard_negatives" -> ((s, dir) => graft.operators.Similarity.hardNegatives(s, dir)),
    "pipe_balance" -> ((s, dir) => graft.operators.Pipeline.balanceClasses(s, dir)),
    "t_bm25" -> ((s, dir) => graft.operators.TextOps.bm25TopDocs(s, dir)),
    "t_rrf" -> ((s, dir) => graft.operators.TextOps.rrfFusion(s, dir)),
    "t_tfidf" -> ((s, dir) => graft.operators.TextOps.tfidfKeywords(s, dir)),
    "t_lang_eval" -> ((s, dir) => graft.operators.TextOps.langEval(s, dir)),
    "t_auc_eval" -> ((s, dir) => graft.operators.TextOps.aucEval(s, dir)),
    "t_pr_curve" -> ((s, dir) => graft.operators.TextOps.prCurve(s, dir)),
    "t_calibration" -> ((s, dir) => graft.operators.TextOps.calibration(s, dir)),
    "dd_prefix_join" -> ((s, dir) => Dedup.prefixJaccard(s, dir)),
    "s_ltv" -> ((s, dir) =>
      graft.streaming.EventStreams.cohortLtv(graft.streaming.EventStreams.events(s, dir))),
    "q21_skew_report" -> ((s, dir) => graft.operators.Olap.skewReport(s, dir)),
    "q22_dq_checks" -> ((s, dir) => graft.operators.Olap.dqChecks(s, dir)),
    "q23_grouping_sets" -> ((s, dir) => graft.operators.Olap.groupingSets(s, dir)),
    "q24_zorder" -> ((s, dir) => graft.operators.Olap.zorderReport(s, dir)),
    "q25_corr" -> ((s, dir) => graft.operators.Olap.orderCorr(s, dir)),
    "pipe_weighted_sample" -> ((s, dir) => graft.operators.Pipeline.weightedSample(s, dir)),
    "pipe_domain_cap" -> ((s, dir) => graft.operators.Pipeline.domainCap(s, dir)),
    "pipe_dataset_card" -> ((s, dir) => graft.operators.Pipeline.datasetCard(s, dir)),
    "s_scd2" -> ((s, dir) =>
      graft.streaming.EventStreams.scd2(graft.streaming.EventStreams.events(s, dir))),
    "s_decay" -> ((s, dir) =>
      graft.streaming.EventStreams.decayScore(graft.streaming.EventStreams.events(s, dir))),
    // engine-invariant HyperLogLog vs exact distinct (self-quantifying probe)
    "q08_hll_distinct" -> ((s, dir) => graft.operators.Sketch.hllOrders(s, dir)),
    // count-min sketch registers + top-10 heavy-hitter probe (est >= exact)
    "q15_cms_heavy" -> ((s, dir) => graft.operators.Sketch.cmsTopParts(s, dir)),
    // bloom runtime-filter probe: pass/true/false-positive accounting
    "q16_bloom_filter" -> ((s, dir) => graft.operators.Sketch.bloomProbe(s, dir)),
    // grouped HLL: distinct orders per return flag, one register pass
    "q18_hll_grouped" -> ((s, dir) => graft.operators.Sketch.hllOrdersByFlag(s, dir)),
    // hierarchical aggregation: one Expand + partial-agg pass
    "q09_rollup" -> ((s, dir) => graft.operators.Olap.rollupReport(s, dir)),
    // exact discrete percentiles, integer index arithmetic
    "q10_percentiles" -> ((s, dir) => graft.operators.Olap.percentiles(s, dir)),
    "q43_mad" -> ((s, dir) => graft.operators.Olap.madByGroup(s, dir)),
    // near-dup refinement: edit distance over LSH candidates only
    "dd_edit_refine" -> ((s, dir) => graft.operators.Olap.editRefine(s, dir)),
    // whole-graph analytic: fixed-point PageRank (GraphX surface,
    // DataFrame-first, integer-exact)
    "it_pagerank" -> ((s, dir) => graft.operators.PageRank.topRanks(s, dir)),
    // HITS hubs & authorities (divisor-normalized integer fixed point)
    "it_hits" -> ((s, dir) => graft.operators.Hits.topAuthorities(s, dir)),
    // sampled stress centrality: all-integer Brandes sibling (σ and
    // continuation counts over the landmark shortest-path DAG)
    "it_stress" -> ((s, dir) => graft.operators.Stress.topStress(s, dir)),
    // Cypher-style diamond motif: same-nation customer/supplier orders
    "g_motif_same_nation" -> ((s, dir) => GraphOps.sameNationTrade(s, dir)),
    // ---- streaming/CDC batch twins (SURVEY §2.5, §3.3) ----
    "s_hourly_agg" -> ((s, dir) =>
      graft.streaming.EventStreams.hourlyAgg(graft.streaming.EventStreams.events(s, dir))),
    // hourly distinct users as a mergeable HLL (constant per-window state)
    "s_windowed_distinct" -> ((s, dir) =>
      graft.streaming.EventStreams.windowedDistinct(graft.streaming.EventStreams.events(s, dir))),
    "s_user_state" -> ((s, dir) =>
      graft.streaming.EventStreams.userState(graft.streaming.EventStreams.events(s, dir))),
    "s_sessionize" -> ((s, dir) =>
      graft.streaming.EventStreams.sessionize(graft.streaming.EventStreams.events(s, dir))),
    // funnel/markov primitive: consecutive event-type transition counts
    "s_transitions" -> ((s, dir) =>
      graft.streaming.EventStreams.transitions(graft.streaming.EventStreams.events(s, dir))),
    // semi-structured: JSON prop extraction inside codegen, then agg
    "s_props_json" -> ((s, dir) =>
      graft.streaming.EventStreams.propStats(graft.streaming.EventStreams.events(s, dir))),
    // semi-structured: parse-once VARIANT column, N typed variant_gets
    "s_props_variant" -> ((s, dir) =>
      graft.streaming.EventStreams.propStatsVariant(graft.streaming.EventStreams.events(s, dir))),
    // BI pivot: static conditional aggregation over the type domain
    "s_pivot_types" -> ((s, dir) =>
      graft.operators.Olap.pivotEvents(graft.streaming.EventStreams.events(s, dir))),
    // time-series densify: per-type hour spine, zero-filled
    "s_gap_fill" -> ((s, dir) =>
      graft.operators.Olap.gapFillHourly(graft.streaming.EventStreams.events(s, dir))),
    // cohort retention: first-event week × offset × distinct actives
    "s_retention" -> ((s, dir) =>
      graft.streaming.EventStreams.retention(graft.streaming.EventStreams.events(s, dir))),
    // robust outlier gate: integer median/MAD per type (no FP z-score)
    "s_anomaly" -> ((s, dir) =>
      graft.operators.Olap.anomalies(graft.streaming.EventStreams.events(s, dir))),
    // three-stage funnel with strict event-time ordering
    "s_funnel" -> ((s, dir) =>
      graft.streaming.EventStreams.funnel(graft.streaming.EventStreams.events(s, dir))),
    // last-touch revenue attribution (IGNORE NULLS carry-forward window)
    "s_attribution" -> ((s, dir) =>
      graft.streaming.EventStreams.attribution(graft.streaming.EventStreams.events(s, dir))),
    // as-of join (sorted-union-window composition)
    "s_asof_join" -> ((s, dir) =>
      graft.operators.AsOfJoin.purchaseLastClick(s, dir)),
    // stream-stream interval join (batch twin; streaming form tested)
    "s_interval_join" -> ((s, dir) =>
      graft.streaming.EventStreams.purchaseClicks(
        graft.streaming.EventStreams.events(s, dir))),
    // snapshot ⊕ increment ≡ full replay: oracle IS the direct replay
    // point-in-time restore: replay only events at-or-before the
    // cutoff — the time-travel form of the S5/S7 backup story (state
    // as of T, not just latest)
    "cdc_pitr" -> ((s, dir) => {
      val ev = graft.streaming.EventStreams.events(s, dir)
      val cutoff = "2024-01-15 00:00:00" // mid-stream: ~half the log
      graft.streaming.EventStreams.userState(
        ev.filter(col("ts") <= lit(cutoff).cast("timestamp")))
    }),
    "cdc_incremental" -> ((s, dir) =>
      graft.streaming.EventStreams.incrementalEquivalence(s, dir)),
    // backup lifecycle WITH verify-after-restore (BackupService.java:
    // 99-102): full backup at W, incremental catch-up, rebuild from the
    // backup files, then verify restored ≡ live. The oracle computes
    // the same totals directly from the events table with n_mismatch=0,
    // so a restore that drifts in ANY row fails the hash compare.
    // Memoized like rec_backup_verify and for the same reason: the
    // full+incremental backup WRITES parquet and replays it — a
    // side-effect chain that repeated on every bench run (the suite's
    // #1 warm wall line, 2.27 s/run × 3 runs × 2 core counts, writing
    // the identical backup each time). The 1-row result checkpoints
    // (O(1) re-analysis); the cold bypass re-runs the whole
    // backup→restore→verify lifecycle, which is what the operator
    // costs.
    "cdc_backup_verify" -> ((s, dir) => cdcBackupCache.getOrElseUpdate(s, dir) {
      import graft.streaming.{Backup, EventStreams}
      val ev = EventStreams.events(s, dir)
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_backup_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
      val w = ev.agg(expr("CAST(max(event_id) div 2 AS BIGINT)")).head().getLong(0)
      Backup.full(s, ev.filter(col("event_id") <= w), tmp)
      Backup.incremental(s, ev, tmp)
      Backup.rebuildState(s, tmp).agg(
        count(lit(1)).as("n_users"),
        sum("n_events").as("n_events"),
        sum("total_cents").as("total_cents"))
        .crossJoin(Backup.verifyRestore(s, tmp, ev)
          .agg(count(lit(1)).as("n_mismatch")))
        .localCheckpoint(true)
    }),
    // ---- LLM-pipeline operators (north star) ----
    "t_token_count" -> ((s, dir) => TextOps.tokenCount(s, dir)),
    "t_fertility" -> ((s, dir) => TextOps.fertility(s, dir)),
    "t_quality" -> ((s, dir) => TextOps.quality(s, dir)),
    "t_ttr" -> ((s, dir) => TextOps.typeTokenRatio(s, dir)),
    "t_source_quality" -> ((s, dir) => TextOps.sourceQuality(s, dir)),
    "t_lang_id" -> ((s, dir) => TextOps.langId(s, dir)),
    "t_fingerprint" -> ((s, dir) => TextOps.fingerprint(s, dir)),
    "t_intra_dedup" -> ((s, dir) => TextOps.intraDedup(s, dir)),
    "t_simhash" -> ((s, dir) => TextOps.simhash(s, dir)),
    "dd_exact" -> ((s, dir) => Dedup.exact(s, dir)),
    "dd_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(s, dir)),
    "dd_containment" -> ((s, dir) => Dedup.containmentDup(s, dir)),
    "dd_minhash_lsh" -> ((s, dir) => Dedup.minhashLsh(s, dir)),
    "dd_bbit_minhash" -> ((s, dir) => Dedup.bbitMinhash(s, dir)),
    "dd_band_sweep" -> ((s, dir) => Dedup.bandSweep(s, dir)),
    "dd_simhash_band" -> ((s, dir) => Dedup.simhashDup(s, dir)),
    "dd_clusters" -> ((s, dir) => Dedup.dedupClusters(s, dir)),
    "dd_cluster_sizes" -> ((s, dir) => Dedup.clusterSizes(s, dir)),
    "dd_lsh_recall" -> ((s, dir) => Dedup.lshRecall(s, dir)),
    // A6 analog (cache counters): runtime storage state, rows-only
    // check by design - values are runtime-dependent like the
    // reference's own cache monitors
    "rec_cache_counters" -> ((s, _) =>
      graft.checker.StoreProfile.cacheCounters(s)),
    // RANGE-frame window (interval trailing sum) — the frame kind the
    // rows-frame family (q11) cannot express; per-user partitions
    "q41_range_window" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val ev = graft.streaming.EventStreams.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us")
        .rangeBetween(-3600000000L, 0L)
      ev.select(col("user_id"), col("event_id"),
        sum("cents").over(w).as("trailing_1h_cents"))
    }),
    // GROUPING SETS over non-nested sets — the lattice shape rollup
    // (q09) and cube (q13) cannot express; one Expand + one
    // partial-agg exchange like both of them
    "q40_grouping_sets" -> ((s, dir) => {
      val li = graft.sources.Tpch.table(s, dir, "lineitem")
        .withColumn("cents", org.apache.spark.sql.functions.expr(
          "CAST(round(l_extendedprice * 100) AS BIGINT)"))
      import org.apache.spark.sql.functions.{col, count, lit, sum}
      li.groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))
    }),
    // ExactSubstr-style cross-doc duplicated-span coverage
    "dd_substring" -> ((s, dir) => Dedup.substringDup(s, dir)),
    // eval-set decontamination: corpus docs sharing a K-token window
    // with the held-out benchmark set (benchmark side broadcast)
    "dd_decontaminate" -> ((s, dir) => Dedup.decontaminate(s, dir)),
    // cross-source contamination: near-dup pair counts by source pair
    "dd_cross_source" -> ((s, dir) => Dedup.crossSourcePairs(s, dir)),
    // robust central tendency: 10-90% trimmed mean per priority
    "q17_trimmed" -> ((s, dir) => graft.operators.Olap.trimmedMean(s, dir)),
    // incremental dedup: delta postings probe the base index; oracle
    // is the full recompute (hash equality proves incremental ≡ batch)
    "dd_incremental" -> ((s, dir) => Dedup.incrementalPairs(s, dir)),
    // maintained-index split (base posting table + df sidecar, delta
    // probe) — hash-gated against the SAME oracle as dd_incremental:
    // the gate proves split-index == union-recompute on every run
    "dd_stream_batch" -> ((s, dir) => Dedup.streamBatchPairs(s, dir)),
    // SHARDED maintained index (postings/df/size sidecars partitioned
    // on key resp. doc shards; probes read only the delta's shards) —
    // hash-gated against the SAME oracle again: pruned probe ==
    // union recompute, every run
    "dd_shard_probe" -> ((s, dir) => graft.operators.DedupShard.shardProbe(s, dir)),
    // canonicalization-aware exact dedup (case/whitespace variants)
    "dd_exact_norm" -> ((s, dir) => Dedup.exactNormalized(s, dir)),
    // equi-width integer histogram (profile/viz primitive)
    "q14_histogram" -> ((s, dir) => graft.operators.Olap.histogram(s, dir)),
    // weighted bipartite projection: strongest co-purchase part pairs
    "g_copurchase" -> ((s, dir) => GraphOps.copurchaseTop(s, dir)),
    // bipartite node similarity: supplier Jaccard over shared parts
    "g_node_similarity" -> ((s, dir) => GraphOps.supplierSimilarity(s, dir)),
    // windowed heavy hitters: top-3 event types per 6h window
    "s_trending" -> ((s, dir) =>
      graft.streaming.EventStreams.trending(
        graft.streaming.EventStreams.events(s, dir))),
    // hierarchical totals over BOTH dimensions' lattice (CUBE)
    "q13_cube" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("cents", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))),
    // Gopher-style repetition quality gates
    "t_repetition" -> ((s, dir) => TextOps.repetition(s, dir)),
    "t_vocab_topk" -> ((s, dir) => TextOps.vocabTopK(s, dir)),
    "t_zipf" -> ((s, dir) => TextOps.zipfFit(s, dir)),
    "t_ngram_entropy" -> ((s, dir) => TextOps.ngramEntropy(s, dir)),
    "t_bpe_train" -> ((s, dir) => TextOps.bpeTrain(s, dir)),
    "t_bpe_apply" -> ((s, dir) => TextOps.bpeApply(s, dir)),
    // skip-gram window co-occurrence: the word2vec/GloVe pre-pass
    "t_cooccur" -> ((s, dir) => TextOps.cooccurTopK(s, dir)),
    "t_dup_ngrams" -> ((s, dir) => TextOps.dupNgrams(s, dir)),
    "t_lm_score" -> ((s, dir) => TextOps.lmScore(s, dir)),
    "t_bpe_pairs" -> ((s, dir) => TextOps.bpePairs(s, dir)),
    "t_hash_features" -> ((s, dir) => TextOps.hashFeatures(s, dir)),
    // MOSS winnowing: per-doc fingerprint selection stats + overlap pairs
    "t_winnow" -> ((s, dir) => TextOps.winnow(s, dir)),
    "dd_winnow_pairs" -> ((s, dir) => Dedup.winnowPairs(s, dir)),
    "dd_winnow_containment" -> ((s, dir) => Dedup.winnowContainment(s, dir)),
    // StarCoder/RedPajama-style code-vs-prose routing signals
    "t_code_detect" -> ((s, dir) => TextOps.codeDetect(s, dir)),
    // DSIR: hashed-ngram importance weights vs the en target slice
    "pipe_dsir" -> ((s, dir) => graft.operators.Pipeline.dsirWeights(s, dir)),
    // the resampling step the weights exist for: per-lang selection rates
    "pipe_dsir_sample" -> ((s, dir) => graft.operators.Pipeline.dsirSample(s, dir)),
    // temperature-scaled source mixture weights (mT5/XLM-R sampling rule)
    "pipe_source_mix" -> ((s, dir) => graft.operators.Pipeline.sourceMix(s, dir)),
    "pipe_epoch_plan" -> ((s, dir) => graft.operators.Pipeline.epochPlan(s, dir)),
    "pipe_dup_sources" -> ((s, dir) => graft.operators.Pipeline.dupSources(s, dir)),
    // per-source vocabulary shift vs the corpus (KL + TV over hashed unigrams)
    "pipe_source_shift" -> ((s, dir) => graft.operators.Pipeline.sourceShift(s, dir)),
    // independent-gate curation ablation funnel per source
    "pipe_filter_funnel" -> ((s, dir) => graft.operators.Pipeline.filterFunnel(s, dir)),
    // cross-source near-duplication flow matrix (winnow pairs × source labels)
    "dd_source_flow" -> ((s, dir) => Dedup.sourceFlow(s, dir)),
    "g_link_prediction" -> ((s, dir) => GraphOps.linkPrediction(s, dir)),
    "ann_topk" -> ((s, dir) => Similarity.annBruteForce(s, dir)),
    "ann_lsh" -> ((s, dir) => Similarity.annLsh(s, dir)),
    "ann_multiprobe" -> ((s, dir) => Similarity.annMultiprobe(s, dir)),
    "ann_ivf" -> ((s, dir) => Similarity.annIvf(s, dir)),
    "ann_ivf_kmeans" -> ((s, dir) => Similarity.annIvfTrained(s, dir)),
    "emb_cluster_stats" -> ((s, dir) => Similarity.clusterStats(s, dir)),
    // recall@K of every approximate ANN variant vs brute-force truth
    "ann_pq" -> ((s, dir) => Similarity.annPq(s, dir)),
    "ann_recall" -> ((s, dir) => Similarity.annRecall(s, dir)),
    "dd_embedding" -> ((s, dir) => Similarity.embeddingDup(s, dir)),
    // SemDeDup: k-means clusters, near-dup pairs only within clusters
    "dd_semantic" -> ((s, dir) => Similarity.semDedup(s, dir)),
    // per-dimension embedding stats (drift monitoring)
    "emb_dim_stats" -> ((s, dir) => Similarity.dimStats(s, dir)),
    // per-class centroid audit: norm + cosine to the corpus-mean direction
    "emb_class_centroids" -> ((s, dir) => Similarity.classCentroids(s, dir)),
    // nearest-centroid classification confusion matrix (embedding-geometry probe)
    "emb_centroid_eval" -> ((s, dir) => Similarity.centroidEval(s, dir)),
    "emb_whiten" -> ((s, dir) => Similarity.whitenNorms(s, dir)),
    "emb_knn_graph" -> ((s, dir) => Similarity.knnGraph(s, dir)),
    "emb_bucket_stats" -> ((s, dir) => Similarity.bucketStats(s, dir)),
    "emb_outliers" -> ((s, dir) => Similarity.embOutliers(s, dir)),
    "emb_int8_quantize" -> ((s, dir) => Similarity.int8Quantize(s, dir)),
    // exact d×d co-moment (gram) matrix — PCA/whitening/drift input
    "emb_gram" -> ((s, dir) => Similarity.gramMatrix(s, dir)),
    "emb_pca" -> ((s, dir) => Similarity.pcaProject(s, dir)),
    // Matryoshka truncation eval: prefix-dim recall vs full-dim truth
    "emb_matryoshka" -> ((s, dir) => Similarity.matryoshkaRecall(s, dir)),
    "g_basket_features" -> ((s, dir) => graft.operators.GraphOps.basketFeatures(s, dir)),
    // multimodal demux: magic-byte sniff next to the bytes
    "mm_modality_route" -> ((s, dir) => Media.modalityRoute(s, dir)),
    "mm_media_features" -> ((s, dir) => Media.mediaFeatures(s, dir)),
    "mm_frame_sample" -> ((s, dir) => Media.frameSample(s, dir)),
    "mm_resize" -> ((s, dir) => Media.resizeThumbs(s, dir)),
    "mm_shard_pack" -> ((s, dir) => Media.shardPack(s, dir)),
    // end-to-end curation: quality ∧ language ∧ not-near-dup, per-lang
    "pipe_curation" -> ((s, dir) => graft.operators.Pipeline.curate(s, dir)),
    // deterministic per-source token-budget sampling (training mix)
    "pipe_sample_budget" -> ((s, dir) => graft.operators.Pipeline.sampleBudget(s, dir)),
    // per-epoch deterministic shuffle + shard routing with order checksums
    "pipe_epoch_shuffle" -> ((s, dir) => graft.operators.Pipeline.epochShuffle(s, dir)),
    // sequence packing: per-source hash-order token cumsum → fixed
    // token-budget training sequences
    "pipe_pack" -> ((s, dir) => graft.operators.Pipeline.packSequences(s, dir)),
    // deterministic 80/10/10 split + balance stats (independent hash)
    "pipe_split" -> ((s, dir) => graft.operators.Pipeline.splitStats(s, dir)),
    // per-source mixture resampling to integer target fractions
    "pipe_mixture" -> ((s, dir) => graft.operators.Pipeline.mixtureSample(s, dir)),
    // PII triage counts (email/phone/IPv4 shapes) over the probe corpus
    "t_pii" -> ((s, dir) => TextOps.piiStats(s, dir)),
    // PII redaction transform (typed placeholders; hash gate compares
    // the redacted strings byte-for-byte via their fingerprints)
    "t_pii_redact" -> ((s, dir) => TextOps.piiRedact(s, dir)),
    // tokenizer coverage: per-doc OOV rate vs the broadcast top-K vocab
    "t_oov" -> ((s, dir) => TextOps.oovRate(s, dir)),
    // the complete release pipeline: quality ∧ lang ∧ dedup ∧
    // decontamination → deterministic split → per-(split,lang) totals
    "pipe_full" -> ((s, dir) => graft.operators.Pipeline.curateFull(s, dir)),
    // per-doc drop-reason audit for the release pipeline
    "pipe_lineage" -> ((s, dir) => graft.operators.Pipeline.curateLineage(s, dir)),
    // train/val/test leakage audit: near-dup pairs crossing split
    // boundaries (internal-contamination complement of decontaminate)
    "pipe_split_leakage" -> ((s, dir) => graft.operators.Pipeline.splitLeakage(s, dir)),
    // eval-contamination audit: distinct token 8-grams of each val/test
    // doc probed against the train split's gram set (r12)
    "pipe_ngram_overlap" -> ((s, dir) => graft.operators.Pipeline.ngramOverlap(s, dir)),
    // the bloom-prefiltered form — identical output by construction
    // (no false negatives + exact join removes false positives), so it
    // gates against the SAME oracle SQL as the exact path
    "pipe_ngram_overlap_bloom" -> ((s, dir) => graft.operators.Pipeline.ngramOverlapBloom(s, dir)),
    // the ACTION the audit implies: drop train docs sharing any 8-gram
    // with the held-out splits (GPT-3-style benchmark decontamination)
    "pipe_decontam_ngram" -> ((s, dir) => graft.operators.Pipeline.ngramDecontaminate(s, dir)),
    // bloom-symmetric decontamination: the EVAL gram set packs into
    // the bitset, the corpus-shaped train stream filters map-side —
    // identical output, same oracle as the exact path
    "pipe_decontam_bloom" -> ((s, dir) => graft.operators.Pipeline.ngramDecontaminateBloom(s, dir)),
    // per-doc drill-down: WHICH eval docs are contaminated, worst first
    "pipe_contam_topdocs" -> ((s, dir) => graft.operators.Pipeline.contamTopDocs(s, dir)),
    // release-audit form: the same matrix per verified near-dup family
    // (ngram-Jaccard / MinHash-LSH / SimHash / winnowing union)
    "pipe_leakage_families" -> ((s, dir) => graft.operators.Pipeline.leakageFamilies(s, dir)),
    "pipe_keep_best" -> ((s, dir) => graft.operators.Pipeline.keepBest(s, dir)),
    // curation v2: repetition ∧ substring-dup ∧ budget, one plan
    "pipe_curation2" -> ((s, dir) => graft.operators.Pipeline.curateV2(s, dir)),
    // curation v3: the decontamination ACTION composed into the
    // release path — train minus gram-leaky docs, packed to sequences
    "pipe_curate_v3" -> ((s, dir) => graft.operators.Pipeline.curateV3(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_scan_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_topk" ->
      """WITH r AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |  FROM lineitem GROUP BY l_orderkey),
        |rk AS (SELECT l_orderkey, revenue_c,
        |  row_number() OVER (ORDER BY revenue_c DESC, l_orderkey) AS rnk FROM r)
        |SELECT l_orderkey, revenue_c, rnk AS rank FROM rk WHERE rnk <= 10""".stripMargin,
    "q05_join_agg" ->
      """SELECT n_name AS nation,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey AND year(o_orderdate) = 1996
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q26_ship_priority" ->
      """WITH r AS (
        |  SELECT l_orderkey, o_orderpriority,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey AND year(o_orderdate) <= 1997
        |  JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
        |  WHERE year(l_shipdate) >= 1998
        |  GROUP BY 1, 2),
        |rk AS (SELECT l_orderkey, o_orderpriority, revenue_c,
        |  row_number() OVER (ORDER BY revenue_c DESC, l_orderkey) AS rnk FROM r)
        |SELECT rnk AS rank, l_orderkey, o_orderpriority, revenue_c
        |FROM rk WHERE rnk <= 10""".stripMargin,
    "q27_nation_volume" ->
      """SELECT 'NATION_' || s_nationkey AS supp_nation,
        |  'NATION_' || c_nationkey AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS volume_c,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey IN (1, 2)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey IN (1, 2)
        |  AND c_nationkey <> s_nationkey
        |WHERE year(l_shipdate) IN (1996, 1997)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q28_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE year(o_orderdate) = 1997 AND EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q29_small_qty" ->
      """WITH pa AS (SELECT l_partkey, sum(l_quantity) AS sq, count(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, count(*) AS n_small,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS loss_c
        |FROM lineitem l
        |JOIN pa ON l.l_partkey = pa.l_partkey
        |JOIN part ON l.l_partkey = p_partkey
        |WHERE l.l_quantity * 5 * cnt < sq
        |GROUP BY p_brand""".stripMargin,
    "q30_big_orders" ->
      """WITH big AS (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING CAST(sum(l_quantity) AS BIGINT) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, total_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q31_wait_suppliers" ->
      """WITH late AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY),
        |allp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM late l JOIN supplier ON l.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM allp a
        |    WHERE a.l_orderkey = l.l_orderkey AND a.l_suppkey <> l.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l2
        |    WHERE l2.l_orderkey = l.l_orderkey AND l2.l_suppkey <> l.l_suppkey)
        |GROUP BY 1, 2""".stripMargin,
    "q32_cold_customers" ->
      """WITH c AS (SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer),
        |a AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_bal, count(*) AS n_bal
        |  FROM c WHERE bal_c > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_cold,
        |  CAST(sum(bal_c) AS BIGINT) AS bal_sum_c
        |FROM c CROSS JOIN a
        |WHERE bal_c * n_bal > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1""".stripMargin,
    "q33_ntile" ->
      """WITH c AS (SELECT c_mktsegment, c_custkey,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
        |w AS (SELECT c_mktsegment, bal_c,
        |  CAST(ntile(4) OVER win AS BIGINT) AS quartile,
        |  round(percent_rank() OVER win, 6) AS pr,
        |  round(cume_dist() OVER win, 6) AS cd
        |  FROM c WINDOW win AS (PARTITION BY c_mktsegment ORDER BY bal_c, c_custkey))
        |SELECT c_mktsegment, quartile, count(*) AS n,
        |  min(bal_c) AS min_bal, max(bal_c) AS max_bal,
        |  min(pr) AS min_pr, max(pr) AS max_pr, max(cd) AS max_cd
        |FROM w GROUP BY 1, 2""".stripMargin,
    "q34_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN s_nationkey = 2 THEN rev_c ELSE 0 END) AS BIGINT)
        |    AS volume_nation_c,
        |  CAST(sum(rev_c) AS BIGINT) AS volume_all_c,
        |  count(*) AS n_items
        |FROM (SELECT l_orderkey, l_suppkey, l_partkey,
        |        CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        CAST(round((1.0 - l_discount) * 100) AS BIGINT) AS rev_c
        |      FROM lineitem) l
        |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND year(o_orderdate) IN (1996, 1997)
        |JOIN customer ON o_custkey = c_custkey
        |  AND c_nationkey IN (2, 7, 12, 17, 22)
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1""".stripMargin,
    "q35_order_count_dist" ->
      """WITH per AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist FROM per GROUP BY c_count""".stripMargin,
    "q36_promo_share" ->
      """SELECT CAST(month(l_shipdate) AS BIGINT) AS l_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT)
        |    AS promo_rev_c,
        |  CAST(sum(rev_c) AS BIGINT) AS total_rev_c,
        |  count(*) AS n_items
        |FROM (SELECT l_partkey, l_shipdate,
        |        CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        CAST(round((1.0 - l_discount) * 100) AS BIGINT) AS rev_c
        |      FROM lineitem WHERE year(l_shipdate) = 1997) l
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,
    "q37_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |      AS total_rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_c
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_c = (SELECT max(total_rev_c) FROM rev)""".stripMargin,
    "q38_supplier_cnt" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) inc
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#3'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q39_disjunctive" ->
      """SELECT count(*) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_c
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
        |       AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
        |       AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
        |       AND p_size BETWEEN 1 AND 15)""".stripMargin,
    "q06_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q07_bucketed_join" ->
      """SELECT o_orderpriority AS priority,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q04_window_rank" ->
      """WITH p AS (SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders),
        |rk AS (SELECT *, row_number() OVER (
        |  PARTITION BY o_custkey ORDER BY price_c DESC, o_orderkey) AS rnk FROM p)
        |SELECT o_custkey, o_orderkey, price_c, rnk AS rank FROM rk WHERE rnk <= 2""".stripMargin,
    "rec_chain_reconstruction" ->
      s"""${Ctes.graph},
         |inc AS (
         |  SELECT src AS node, id AS rel_id FROM rels
         |  UNION ALL SELECT dst, id FROM rels)
         |SELECT node, count(*) AS chain_len,
         |  min(rel_id) AS chain_head,
         |  max(rel_id) AS chain_tail,
         |  CAST(sum((rel_id % 1000003) * (rel_id % 999983)) AS BIGINT) AS chain_sig
         |FROM inc GROUP BY node""".stripMargin,
    "g_node_count_by_kind" ->
      s"${Ctes.graph} SELECT kind, count(*) AS n FROM nodes GROUP BY kind",
    "g_rel_count_by_type" ->
      s"${Ctes.graph} SELECT type, count(*) AS n FROM rels GROUP BY type",
    "g_out_degree_by_type" ->
      s"${Ctes.graph} SELECT src AS node_id, type, count(*) AS degree FROM rels GROUP BY src, type",
    "g_orders_per_nation" ->
      s"""${Ctes.graph}
         |SELECT n.name AS nation, count(*) AS n_orders
         |FROM rels p
         |JOIN rels c ON p.type = 'PLACED_BY' AND c.type = 'IN_NATION' AND p.dst = c.src
         |JOIN nodes n ON n.kind = 'nation' AND c.dst = n.id
         |GROUP BY n.name""".stripMargin,
    "g_point_lookup" ->
      s"""${Ctes.graph}
         |SELECT id, kind, name FROM nodes
         |WHERE id IN (1000000000001, 2000000000007, 3000000000042, 6000000000100)""".stripMargin,
    "g_prop_keys" ->
      s"""${Ctes.graph}
         |SELECT kind,
         |  CASE WHEN kind = 'customer' THEN 'acctbal,mktsegment,name'
         |       WHEN kind = 'supplier' THEN 'acctbal,name'
         |       WHEN kind = 'part' THEN 'brand,name,retailprice,size,type'
         |       WHEN kind = 'order' THEN 'name,status,totalprice'
         |       ELSE 'name' END AS prop_keys,
         |  count(*) AS n
         |FROM nodes GROUP BY 1, 2""".stripMargin,
    "g_expand_directions" ->
      s"""${Ctes.graph},
         |inc AS (
         |  SELECT src AS nation_id, type, 1 AS is_out FROM rels
         |  UNION ALL SELECT dst, type, 0 FROM rels),
         |deg AS (
         |  SELECT nation_id, type, CAST(sum(is_out) AS BIGINT) AS n_out,
         |    CAST(sum(1 - is_out) AS BIGINT) AS n_in
         |  FROM inc GROUP BY 1, 2)
         |SELECT n.name AS nation, d.type, d.n_out, d.n_in
         |FROM nodes n JOIN deg d ON n.id = d.nation_id
         |WHERE n.kind = 'nation'""".stripMargin,
    "g_path_expand" ->
      s"""${Ctes.graph},
         |er AS (SELECT dst AS f, src AS t FROM rels),
         |reg AS (SELECT id, name AS region FROM nodes WHERE kind = 'region'),
         |c1 AS (SELECT r.region, e.t, count(*) AS n
         |  FROM reg r JOIN er e ON e.f = r.id GROUP BY 1, 2),
         |c2 AS (SELECT c.region, e.t, CAST(sum(c.n) AS BIGINT) AS n
         |  FROM c1 c JOIN er e ON e.f = c.t GROUP BY 1, 2),
         |c3 AS (SELECT c.region, e.t, CAST(sum(c.n) AS BIGINT) AS n
         |  FROM c2 c JOIN er e ON e.f = c.t GROUP BY 1, 2)
         |SELECT region, 1 AS depth, CAST(sum(n) AS BIGINT) AS n_paths FROM c1 GROUP BY region
         |UNION ALL
         |SELECT region, 2 AS depth, CAST(sum(n) AS BIGINT) AS n_paths FROM c2 GROUP BY region
         |UNION ALL
         |SELECT region, 3 AS depth, CAST(sum(n) AS BIGINT) AS n_paths FROM c3 GROUP BY region""".stripMargin,
    "g_index_lookup" ->
      s"""SELECT 'customers_by_segment' AS index_name, 'mktsegment' AS key,
         |  c_mktsegment AS value, count(*) AS n,
         |  min(${3 * Ctes.B} + c_custkey) AS min_id,
         |  max(${3 * Ctes.B} + c_custkey) AS max_id
         |FROM customer WHERE c_mktsegment = 'BUILDING'
         |GROUP BY 1, 2, 3""".stripMargin,
    "g_degree_histogram" ->
      s"""${Ctes.graph},
         |inc AS (SELECT src AS node FROM rels UNION ALL SELECT dst FROM rels),
         |deg AS (SELECT node, count(*) AS degree FROM inc GROUP BY node)
         |SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree""".stripMargin,
    "g_motif_same_nation" ->
      s"""${Ctes.graph},
         |cn AS (
         |  SELECT p.src AS order_id, n.dst AS nation_id
         |  FROM rels p JOIN rels n ON p.dst = n.src
         |  WHERE p.type = 'PLACED_BY' AND n.type = 'IN_NATION'),
         |sn AS (
         |  SELECT p.src AS order_id, n.dst AS nation_id
         |  FROM rels p JOIN rels n ON p.dst = n.src
         |  WHERE p.type = 'SUPPLIED_BY' AND n.type = 'IN_NATION'),
         |m AS (
         |  SELECT cn.order_id, cn.nation_id
         |  FROM cn JOIN sn ON cn.order_id = sn.order_id
         |    AND cn.nation_id = sn.nation_id)
         |SELECT nd.name AS nation, count(*) AS n_pairs,
         |  CAST(count(DISTINCT m.order_id) AS BIGINT) AS n_orders
         |FROM m JOIN nodes nd ON m.nation_id = nd.id
         |GROUP BY nd.name""".stripMargin,
    "rec_stores_profile" -> RecordCtes.recProfile,
    "rec_backup_verify" -> RecordCtes.recBackupVerify,
    "rec_prop_stats" -> RecordCtes.recPropStats,
    "rec_chain_repair" -> RecordCtes.recChainRepair,
    "cc_violations" -> RecordCtes.ccViolations,
    "cc_summary" -> RecordCtes.ccSummary,
    "cc_diff_check" -> RecordCtes.ccDiffCheck,
    "gen_summary" -> GenCtes.summary,
    "gen_store_check" -> GenCtes.storeCheck,
    "it_connected_components" -> IterCtes.connectedComponents,
    "it_lpa" -> IterCtes.labelPropagation,
    "it_bfs_depth" -> IterCtes.bfsDepth,
    "it_cc_converged" -> IterCtes.connectedComponentsConverged,
    "it_sssp" -> IterCtes.sssp,
    "it_triangles" -> IterCtes.triangles,
    "it_kcore" -> IterCtes.kcore,
    "it_msf" -> IterCtes.msf,
    "it_scc" -> IterCtes.scc,
    "it_coreness" -> IterCtes.coreness,
    "it_hyperball" -> IterCtes.hyperball,
    "g_random_walks" -> IterCtes.randomWalks,
    "it_ktruss" -> IterCtes.ktruss,
    "it_mis" -> IterCtes.misRounds,
    "g_clustering" -> IterCtes.clusteringStats,
    "s_late" -> EventCtes.lateness,
    "it_harmonic" -> IterCtes.harmonicTop,
    "it_neighborhood" -> IterCtes.neighborhood,
    "it_diameter" -> IterCtes.effectiveDiameter,
    "it_ppr" -> graft.oracle.PageRankCtes.personalized,
    "q19_sample_quantiles" -> SketchCtes.sampleQuantiles,
    "q20_kmv_distinct" -> SketchCtes.kmvOrders,
    "q42_kmv_intersect" -> SketchCtes.kmvIntersect,
    "t_boilerplate" -> TextCtes.boilerplate,
    "pipe_chunk" -> TextCtes.chunkStats,
    "ann_hard_negatives" -> TextCtes.hardNegatives,
    "pipe_balance" -> TextCtes.balanceClasses,
    "t_bm25" -> TextCtes.bm25TopDocs,
    "t_rrf" -> TextCtes.rrfFusion,
    "t_tfidf" -> TextCtes.tfidfKeywords,
    "t_lang_eval" -> TextCtes.langEval,
    "t_auc_eval" -> TextCtes.aucEval,
    "t_pr_curve" -> TextCtes.prCurve,
    "t_calibration" -> TextCtes.calibration,
    // oracle is the PLAIN inverted-index Jaccard: hash equality proves
    // the prefix pruning lossless (cf. dd_incremental)
    "dd_prefix_join" -> TextCtes.ngramJaccard,
    "s_scd2" -> EventCtes.scd2,
    "s_ltv" -> EventCtes.cohortLtv,
    "q21_skew_report" -> OlapCtes.skewReport,
    "q22_dq_checks" -> OlapCtes.dqChecks,
    "q23_grouping_sets" -> OlapCtes.groupingSets,
    "q24_zorder" -> OlapCtes.zorderReport,
    "q25_corr" -> OlapCtes.orderCorr,
    "pipe_weighted_sample" -> OlapCtes.weightedSample,
    "pipe_domain_cap" -> TextCtes.domainCap,
    "pipe_dataset_card" -> TextCtes.datasetCard,
    "s_decay" -> EventCtes.decayScore,
    "q08_hll_distinct" -> SketchCtes.hllOrders,
    "q15_cms_heavy" -> SketchCtes.cmsTopParts,
    "q16_bloom_filter" -> SketchCtes.bloomProbe,
    "q18_hll_grouped" -> SketchCtes.hllOrdersByFlag,
    "q09_rollup" -> OlapCtes.rollupReport,
    "q10_percentiles" -> OlapCtes.percentiles,
    "q43_mad" -> OlapCtes.madByGroup,
    "dd_edit_refine" -> OlapCtes.editRefine,
    "s_pivot_types" -> OlapCtes.pivotEvents,
    "s_gap_fill" -> OlapCtes.gapFillHourly,
    "s_retention" -> EventCtes.retention,
    "s_attribution" -> EventCtes.attribution,
    "s_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT count(*) AS n_users,
        |  CAST(count(t1.t1) AS BIGINT) AS n_viewed,
        |  CAST(count(t2.t2) AS BIGINT) AS n_clicked_after,
        |  CAST(count(t3.t3) AS BIGINT) AS n_purchased_after
        |FROM u LEFT JOIN t1 ON u.user_id = t1.user_id
        |LEFT JOIN t2 ON u.user_id = t2.user_id
        |LEFT JOIN t3 ON u.user_id = t3.user_id""".stripMargin,
    "s_anomaly" ->
      """WITH ev AS (SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY cents, event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS cnt FROM ev),
        |med AS (SELECT event_type,
        |  max(CASE WHEN rn = (cnt - 1) // 2 + 1 THEN cents END) AS med_cents
        |  FROM r1 GROUP BY event_type),
        |dev AS (SELECT e.event_type, e.event_id, e.cents,
        |  abs(e.cents - m.med_cents) AS dev, m.med_cents
        |  FROM ev e JOIN med m ON e.event_type = m.event_type),
        |r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY dev, event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS cnt FROM dev),
        |mad AS (SELECT event_type,
        |  max(CASE WHEN rn = (cnt - 1) // 2 + 1 THEN dev END) AS mad_cents
        |  FROM r2 GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n,
        |  max(d.med_cents) AS med_cents, max(a.mad_cents) AS mad_cents,
        |  CAST(sum(CASE WHEN d.dev > a.mad_cents * 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad a ON d.event_type = a.event_type
        |GROUP BY d.event_type""".stripMargin,
    "q12_set_ops" ->
      """WITH d AS (
        |  SELECT l.l_suppkey, o.o_orderdate
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |early AS (SELECT DISTINCT l_suppkey FROM d
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        |late AS (SELECT DISTINCT l_suppkey FROM d
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
        |tagged AS (
        |  SELECT 'both' AS cohort, l_suppkey
        |  FROM (SELECT l_suppkey FROM early INTERSECT SELECT l_suppkey FROM late)
        |  UNION ALL
        |  SELECT 'early_only', l_suppkey
        |  FROM (SELECT l_suppkey FROM early EXCEPT SELECT l_suppkey FROM late))
        |SELECT cohort, count(*) AS n_suppliers FROM tagged GROUP BY cohort""".stripMargin,
    "q02_argmin" ->
      """WITH x AS (
        |  SELECT p.p_brand, l.l_partkey, l.l_suppkey,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |r AS (SELECT *, row_number() OVER (PARTITION BY p_brand
        |  ORDER BY cents, l_partkey, l_suppkey) AS rn FROM x)
        |SELECT p_brand, l_partkey AS best_partkey,
        |  l_suppkey AS best_suppkey, cents AS min_cents
        |FROM r WHERE rn = 1""".stripMargin,
    "q11_running_window" ->
      """WITH x AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS running_c,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS trailing3_c
        |FROM x""".stripMargin,
    "cdc_pitr" ->
      """WITH ev AS (SELECT *, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  max(CASE WHEN rn = 1 THEN event_type END) AS last_type,
        |  max(CASE WHEN rn = 1 THEN ts END) AS last_ts,
        |  max(CASE WHEN rn = 1 THEN event_id END) AS last_event_id
        |FROM r GROUP BY user_id""".stripMargin,
    "it_pagerank" -> graft.oracle.PageRankCtes.topRanks,
    "it_hits" -> graft.oracle.HitsCtes.topAuthorities,
    "it_stress" -> graft.oracle.StressCtes.topStress,
    "s_hourly_agg" -> EventCtes.hourlyAgg,
    "s_windowed_distinct" -> SketchCtes.windowedDistinct,
    "s_trending" -> EventCtes.trending,
    "g_node_similarity" ->
      s"""WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
        |ok AS (SELECT p FROM sp GROUP BY p
        |  HAVING count(*) <= ${graft.operators.GraphOps.SimDfCap}),
        |c AS (SELECT s, p FROM sp JOIN ok USING (p)),
        |sz AS (SELECT s, CAST(count(*) AS BIGINT) AS ns FROM c GROUP BY s),
        |i AS (SELECT a.s AS a, b.s AS b, CAST(count(*) AS BIGINT) AS inter
        |  FROM c a JOIN c b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
        |j AS (SELECT a, b, inter / CAST(na + nb - inter AS DOUBLE) AS jacc
        |  FROM i
        |  JOIN (SELECT s AS a, ns AS na FROM sz) sa USING (a)
        |  JOIN (SELECT s AS b, ns AS nb FROM sz) sb USING (b))
        |SELECT a, b, jacc FROM j WHERE jacc >= ${graft.operators.GraphOps.SimTau}
        |ORDER BY jacc DESC, a, b LIMIT ${graft.operators.GraphOps.SimTopK}""".stripMargin,
    "s_user_state" -> EventCtes.userState,
    "s_sessionize" -> EventCtes.sessionize,
    "s_transitions" -> EventCtes.transitions,
    "s_props_json" -> EventCtes.propStats,
    "s_props_variant" -> EventCtes.propStatsVariant,
    "s_asof_join" -> EventCtes.asofJoin,
    "s_interval_join" -> EventCtes.intervalJoin,
    "cdc_incremental" -> EventCtes.userState,
    "cdc_backup_verify" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(0 AS BIGINT) AS n_mismatch
        |FROM events""".stripMargin,
    "t_token_count" -> TextCtes.tokenCount,
    "t_fertility" -> TextCtes.fertility,
    "t_quality" -> TextCtes.quality,
    "t_ttr" -> TextCtes.typeTokenRatio,
    "t_source_quality" -> TextCtes.sourceQuality,
    "t_lang_id" -> TextCtes.langId,
    "t_fingerprint" -> TextCtes.fingerprint,
    "t_intra_dedup" -> TextCtes.intraDedup,
    "t_simhash" -> TextCtes.simhash,
    "dd_exact" -> TextCtes.dedupExact,
    "dd_ngram_jaccard" -> TextCtes.ngramJaccard,
    "dd_containment" -> TextCtes.containmentDup,
    "dd_minhash_lsh" -> TextCtes.minhashLsh,
    "dd_bbit_minhash" -> TextCtes.bbitMinhash,
    "dd_band_sweep" -> TextCtes.bandSweep,
    "dd_simhash_band" -> TextCtes.simhashDup,
    "dd_clusters" -> TextCtes.dedupClusters,
    "dd_lsh_recall" ->
      s"""WITH e AS (SELECT a, b FROM (${graft.oracle.TextCtes.ngramJaccard})),
         |l AS (SELECT a, b FROM (${graft.oracle.TextCtes.minhashLsh})),
         |h AS (SELECT a, b FROM e INTERSECT SELECT a, b FROM l),
         |c AS (SELECT (SELECT count(*) FROM e) AS n_exact,
         |  (SELECT count(*) FROM l) AS n_lsh,
         |  (SELECT count(*) FROM h) AS n_hit)
         |SELECT n_exact, n_lsh, n_hit,
         |  CAST(n_hit AS DOUBLE) / n_exact AS recall,
         |  CAST(n_hit AS DOUBLE) / n_lsh AS precision
         |FROM c""".stripMargin,
    "q41_range_window" ->
      """WITH b AS (SELECT user_id, event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT user_id, event_id,
        |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS trailing_1h_cents
        |FROM b""".stripMargin,
    "q40_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "dd_cluster_sizes" ->
      s"""SELECT cluster_size, count(*) AS n_clusters FROM (
         |  SELECT canonical, count(*) + 1 AS cluster_size
         |  FROM (${TextCtes.dedupClusters}) GROUP BY canonical)
         |GROUP BY cluster_size""".stripMargin,
    "dd_substring" -> TextCtes.substringDup,
    "dd_decontaminate" -> TextCtes.decontaminate,
    "dd_cross_source" -> TextCtes.crossSourcePairs,
    "q17_trimmed" -> OlapCtes.trimmedMean,
    "dd_incremental" -> TextCtes.incrementalPairs,
    "dd_stream_batch" -> TextCtes.incrementalPairs,
    "dd_shard_probe" -> TextCtes.incrementalPairs,
    "dd_exact_norm" -> TextCtes.exactNormalized,
    "q14_histogram" ->
      s"""WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM o)
        |SELECT (cents - mn) * ${graft.operators.Olap.HistBuckets} // (mx - mn + 1)
        |    AS bucket,
        |  count(*) AS n, min(cents) AS lo_cents, max(cents) AS hi_cents
        |FROM o, b GROUP BY 1""".stripMargin,
    "g_copurchase" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (
        |  SELECT a.pk AS a, b.pk AS b, count(*) AS w
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2)
        |SELECT a, b, w FROM pairs
        |ORDER BY w DESC, a, b LIMIT ${graft.operators.GraphOps.CopurchaseTopK}""".stripMargin,
    "q13_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "t_repetition" -> TextCtes.repetition,
    "t_vocab_topk" -> TextCtes.vocabTopK,
    "t_zipf" -> TextCtes.zipfFit,
    "t_ngram_entropy" -> TextCtes.ngramEntropy,
    "t_bpe_train" -> TextCtes.bpeTrain,
    "t_bpe_apply" -> TextCtes.bpeApply,
    "t_cooccur" -> TextCtes.cooccurTopK,
    "t_dup_ngrams" -> TextCtes.dupNgrams,
    "t_lm_score" -> TextCtes.lmScore,
    "t_bpe_pairs" -> TextCtes.bpePairs,
    "t_hash_features" -> TextCtes.hashFeatures,
    "t_winnow" -> TextCtes.winnow,
    "dd_winnow_pairs" -> TextCtes.winnowPairs,
    "dd_winnow_containment" -> TextCtes.winnowContainment,
    "t_code_detect" -> TextCtes.codeDetect,
    "pipe_dsir" -> TextCtes.dsirWeights,
    "pipe_dsir_sample" -> TextCtes.dsirSample,
    "pipe_source_mix" -> TextCtes.sourceMix,
    "pipe_epoch_plan" -> TextCtes.epochPlan,
    "pipe_dup_sources" -> TextCtes.dupSources,
    "pipe_source_shift" -> TextCtes.sourceShift,
    "pipe_filter_funnel" -> TextCtes.filterFunnel,
    "dd_source_flow" -> TextCtes.sourceFlow,
    "emb_matryoshka" -> TextCtes.matryoshka,
    "g_link_prediction" ->
      s"""WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
        |pd AS (SELECT p, CAST(count(*) AS BIGINT) AS pd FROM sp GROUP BY p
        |  HAVING count(*) <= ${graft.operators.GraphOps.SimDfCap}),
        |c AS (SELECT s, p, pd FROM sp JOIN pd USING (p))
        |SELECT a.s AS a, b.s AS b, CAST(count(*) AS BIGINT) AS cn,
        |  CAST(sum(${graft.operators.GraphOps.RaScale} // a.pd) AS BIGINT) AS ra_micro
        |FROM c a JOIN c b ON a.p = b.p AND a.s < b.s
        |GROUP BY 1, 2
        |ORDER BY ra_micro DESC, a, b LIMIT ${graft.operators.GraphOps.RaTopK}""".stripMargin,
    "ann_topk" -> TextCtes.annBruteForce,
    "ann_lsh" -> TextCtes.annLsh,
    "ann_multiprobe" -> TextCtes.annMultiprobe,
    "ann_ivf" -> TextCtes.annIvf,
    "ann_ivf_kmeans" -> TextCtes.annIvfTrained,
    "emb_cluster_stats" -> TextCtes.ivfClusterStats,
    "ann_pq" -> TextCtes.annPq,
    "ann_recall" -> TextCtes.annRecall,
    "dd_embedding" -> TextCtes.embeddingDup,
    "dd_semantic" -> TextCtes.semDedup,
    "emb_dim_stats" -> TextCtes.dimStats,
    "emb_class_centroids" -> TextCtes.classCentroids,
    "emb_centroid_eval" -> TextCtes.centroidEval,
    "emb_whiten" -> TextCtes.whitenNorms,
    "emb_knn_graph" -> TextCtes.knnGraph,
    "emb_bucket_stats" -> TextCtes.bucketStats,
    "emb_outliers" -> TextCtes.embOutliers,
    "emb_gram" -> TextCtes.gramMatrix,
    "emb_pca" -> TextCtes.pcaProject,
    "g_basket_features" -> TextCtes.basketFeatures,
    "emb_int8_quantize" -> TextCtes.int8Quantize,
    "mm_modality_route" -> TextCtes.modalityRoute,
    "mm_media_features" -> TextCtes.mediaFeatures,
    "mm_frame_sample" -> TextCtes.frameSample,
    "mm_resize" -> TextCtes.resizeThumbs,
    "mm_shard_pack" -> TextCtes.shardPack,
    "pipe_curation" -> TextCtes.curation,
    "pipe_sample_budget" -> TextCtes.sampleBudget,
    "pipe_epoch_shuffle" -> TextCtes.epochShuffle,
    "pipe_pack" -> TextCtes.packSequences,
    "pipe_split" -> TextCtes.splitStats,
    "pipe_mixture" -> TextCtes.mixtureSample,
    "t_pii" -> TextCtes.piiStats,
    "t_pii_redact" -> TextCtes.piiRedact,
    "t_oov" -> TextCtes.oovRate,
    "pipe_full" -> TextCtes.curateFull,
    "pipe_lineage" -> TextCtes.curateLineage,
    "pipe_split_leakage" -> TextCtes.splitLeakage,
    "pipe_ngram_overlap" -> TextCtes.ngramOverlap,
    // exact join == correctness reference for the bloom path: one
    // oracle, two engine plans (VERDICT r12 Next #5)
    "pipe_ngram_overlap_bloom" -> TextCtes.ngramOverlap,
    "pipe_decontam_ngram" -> TextCtes.ngramDecontaminate,
    // exact rollup == correctness reference for the bloom-symmetric
    // path: one oracle, two engine plans (same contract as the
    // overlap bloom pair)
    "pipe_decontam_bloom" -> TextCtes.ngramDecontaminate,
    "pipe_contam_topdocs" -> TextCtes.contamTopDocs,
    "pipe_leakage_families" -> TextCtes.leakageFamilies,
    "pipe_keep_best" -> TextCtes.keepBest,
    "pipe_curation2" -> TextCtes.curationV2,
    "pipe_curate_v3" -> TextCtes.curateV3,
  )
}
