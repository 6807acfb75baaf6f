package graft

import org.apache.spark.sql.SparkSession

/** Prints the plan facts that matter at scale for key queries —
  * pushed filters, read schemas (column pruning), join strategies,
  * codegen stages. Run: `sbt "runMain graft.PlanAudit [sfDir]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq("PushedFilters", "ReadSchema", "BroadcastHashJoin",
      "SortMergeJoin", "BroadcastExchange", "Exchange hashpartitioning",
      "LeftAnti", "TakeOrderedAndProject", "graft_dot")
    def audit(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      println(s"== $name")
      plan.linesIterator
        .filter(l => interesting.exists(l.contains))
        .map(_.trim.take(300))
        .take(12)
        .foreach(l => println(s"   $l"))
    }
    Seq("g_point_lookup", "q01_scan_agg", "g_orders_per_nation",
      "cc_violations", "ann_lsh", "q03_topk", "q05_join_agg",
      "pipe_curation",
      // r3 additions: candidate-scored LSH verify (no inverted-index
      // self-join), capped simhash band join, array-store checks,
      // partial-agg chain stats
      "dd_minhash_lsh", "dd_simhash_band", "rec_prop_stats",
      "rec_chain_reconstruction",
      // r4 additions: oriented wedge join (no cartesian), inverted-
      // index substring dedup, rollup Expand, percentile windows,
      // budget-sampling windows, HLL partial-agg registers
      "it_triangles", "dd_substring", "q09_rollup", "q10_percentiles",
      "pipe_sample_budget", "q08_hll_distinct",
      // r5 additions: broadcast-benchmark decontamination, shuffle-free
      // PII scan, per-source packing/mixture windows, broadcast-vocab
      // OOV, composed release pipeline (two anti-joins), CMS registers,
      // bloom bit-set probe, LPA vote rounds
      "dd_decontaminate", "t_pii", "pipe_pack", "pipe_mixture",
      "t_oov", "pipe_full", "q15_cms_heavy", "q16_bloom_filter",
      "it_lpa",
      // r5 session-2 additions: stats-then-broadcast-map whitening,
      // literal-array PCA projection (zero joins), basket feature
      // aggregation (two partial-agg groupBys), distinct-score eval
      // windows, containment index join, classic semi/top-k joins
      "emb_whiten", "emb_pca", "g_basket_features", "t_auc_eval",
      "t_pr_curve", "dd_containment", "q26_ship_priority",
      "q27_nation_volume", "q28_priority_exists",
      // r11 additions: signature-column b-bit/band sweeps (no explode,
      // pair-table probes), broadcast-centroid cluster stats, exact-sum
      // fertility groupBy, sources-row epoch plan, pair-fold source
      // cross-tab
      "dd_bbit_minhash", "dd_band_sweep", "emb_cluster_stats",
      "t_fertility", "pipe_epoch_plan", "pipe_dup_sources",
      // r13 additions: the contamination family — map-side gram join,
      // bloom-prefiltered probe (broadcast bitset ahead of the gram
      // exchange), eval-gram semi-probe decontamination, per-doc top-k
      "pipe_ngram_overlap", "pipe_ngram_overlap_bloom",
      "pipe_decontam_ngram", "pipe_contam_topdocs").foreach(audit)
    // driver t1 smoke simulation: entry must return rows on sf0.001
    println(s"== entry smoke: ${SparkEntry.entry(spark).count()} rows")
    spark.stop()
  }
}
