package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-11 additions: the multi-family leakage audit's completeness
  * (per family: every verified pair counted exactly once), the
  * placeholder-count semantics of piiRedact, and the sharded index's
  * amortized file listing (tables opened once per session, pruning
  * still in the per-probe plan). */
class Round11OpsSpec extends SparkTestBase {

  test("leakage-families matrix: per family, cells sum to that family's pair table; labels canonical") {
    TextOps.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.001"
    val m = Pipeline.leakageFamilies(spark, dir).collect()
    // completeness per family, iterating the SAME source list the
    // query unions — a family added to one place is checked or counted
    // by construction, never silently dropped
    val srcs = Pipeline.leakagePairSources(spark, dir)
    assert(m.map(_.getAs[String]("family")).toSet === srcs.map(_._1).toSet)
    srcs.foreach { case (fam, pairs, _) =>
      val cells = m.filter(_.getAs[String]("family") == fam)
      assert(cells.map(_.getAs[Long]("n_pairs")).sum === pairs.count(),
        s"family $fam cells do not sum to its pair table")
    }
    val rank = Map("train" -> 0, "val" -> 1, "test" -> 2)
    m.foreach { r =>
      val (a, b) = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(rank.contains(a) && rank.contains(b), s"$a/$b")
      assert(rank(a) <= rank(b), s"matrix cell not canonical: ($a, $b)")
    }
    // the ngram_jaccard slice must BE the single-family audit
    val single = Pipeline.splitLeakage(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val slice = m.filter(_.getAs[String]("family") == "ngram_jaccard")
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(slice === single)
  }

  test("piiRedact: n_redacted equals placeholders in output (overlaps counted once)") {
    import spark.implicits._
    // an IP inside an email-looking token: the email pattern consumes
    // it, the chained replace emits ONE <EMAIL>, and n_redacted must
    // say 1 — the raw-text per-pattern sum would say 2 (ADVICE r10)
    val doc = Seq((0L, "contact user@10.0.0.1 or 555-123-4567 now"))
      .toDF("doc_id", "text")
    val out = TextOps.piiRedactOf(doc).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_redacted") === 2L) // <EMAIL> + <PHONE>
  }

  test("bbitMinhash: one row per verified pair; estimator exact in the bit count") {
    TextOps.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.bbitMinhash(spark, dir).collect()
    val pairs = Dedup.minhashLsh(spark, dir).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet === pairs)
    assert(out.length === pairs.size) // exactly once each
    out.foreach { r =>
      val m = r.getAs[Long]("n_match")
      assert(m >= 0 && m <= Dedup.NumHashes)
      // (2m-k)/k with k a power of two: the double is exact, so strict
      // equality against the recomputed value is legitimate
      assert(r.getAs[Double]("j_est") ===
        (2.0 * m - Dedup.NumHashes) / Dedup.NumHashes)
      assert(r.getAs[Double]("abs_err") <= 1.0 + 1e-12)
    }
    // the estimator must carry signal on true near-dups: pairs here are
    // jacc >= 0.5, so the MEAN 1-bit estimate must sit well above the
    // 0.0 a random pair would give
    val meanEst = out.map(_.getAs[Double]("j_est")).sum / out.length
    assert(meanEst > 0.3, s"mean 1-bit estimate $meanEst carries no signal")
  }

  test("fertility: groups partition the corpus; ratios derive from exact sums") {
    TextOps.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.001"
    val out = TextOps.fertility(spark, dir).collect()
    val nDocs = TextOps.docs(spark, dir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === nDocs)
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      assert(r.getAs[Double]("chars_per_token") > 0.0)
    }
  }

  test("epochPlan: cap semantics — epochs = min(raw, MaxEpochs), shortfall only when capped") {
    TextOps.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.001"
    val out = Pipeline.epochPlan(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val raw = r.getAs[Double]("epochs_raw")
      val ep = r.getAs[Double]("epochs")
      assert(ep === math.min(raw, Pipeline.MaxEpochs))
      val shortfall = r.getAs[Double]("shortfall")
      if (raw <= Pipeline.MaxEpochs) assert(math.abs(shortfall) < 1e-6,
        s"uncapped source has shortfall $shortfall")
      else assert(shortfall > 0.0, "capped source must report its deficit")
    }
    // the plan spends the budget it was given: realized + shortfall = target
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("target_tokens") -
        r.getAs[Double]("realized_tokens") - r.getAs[Double]("shortfall")) < 1e-6)
    }
  }

  test("clusterStats: every valid vector counted once; mean dot consistent; assignment broadcast") {
    TextOps.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.001"
    val stats = Similarity.clusterStats(spark, dir)
    val out = stats.collect()
    val nValid = Similarity.quantizedCached(spark, dir).count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === nValid)
    out.foreach { r =>
      assert(r.getAs[Long]("n_vecs") > 0 && r.getAs[Long]("cn") > 0)
      assert(r.getAs[Double]("avg_dot") ===
        r.getAs[Long]("sum_dot").toDouble / r.getAs[Long]("n_vecs"))
    }
    // scale shape: the centroid attach must be a broadcast, never a
    // shuffled join — the corpus-side pass is the only big input
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("bandSweep: nesting monotonicity, completeness, and b4r4 == the production LSH") {
    TextOps.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.bandSweep(spark, dir).collect()
    val nPairs = Dedup.ngramJaccard(spark, dir).count()
    val byCfg = out.groupBy(_.getAs[String]("config"))
    assert(byCfg.keySet === Set("b2r8", "b4r4", "b8r2"))
    // completeness: every config's cells partition the verified pairs
    byCfg.foreach { case (c, rows) =>
      assert(rows.map(_.getAs[Long]("n_pairs")).sum === nPairs, c)
    }
    // band nesting: a full 2x8 band contains two full 4x4 bands, etc.,
    // so detection is monotone in band count PER DECILE
    def det(c: String) = byCfg(c)
      .map(r => r.getAs[Long]("j_decile") -> r.getAs[Long]("n_detected")).toMap
    val (d2, d4, d8) = (det("b2r8"), det("b4r4"), det("b8r2"))
    (d2.keySet ++ d4.keySet ++ d8.keySet).foreach { dec =>
      assert(d2.getOrElse(dec, 0L) <= d4.getOrElse(dec, 0L), s"decile $dec")
      assert(d4.getOrElse(dec, 0L) <= d8.getOrElse(dec, 0L), s"decile $dec")
    }
    // the b4r4 row IS the production config: its detected total must
    // equal the MinHash-LSH pair table (LSH pairs = verified pairs
    // that share >= 1 full 4x4 band, by construction)
    assert(d4.values.sum === Dedup.minhashLsh(spark, dir).count())
  }

  test("dupSources: ngram-family cells partition its pair table; canonical ordering") {
    TextOps.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.001"
    // r12 made the audit per-family; this test's original claim lives
    // on as the ngram_jaccard slice (Round12OpsSpec checks all families)
    val out = Pipeline.dupSources(spark, dir).collect()
      .filter(_.getAs[String]("family") == "ngram_jaccard")
    assert(out.map(_.getAs[Long]("n_pairs")).sum ===
      Dedup.ngramJaccard(spark, dir).count())
    out.foreach { r =>
      assert(r.getAs[String]("source_lo") <= r.getAs[String]("source_hi"))
      assert(r.getAs[Long]("n_strong") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("sharded probe reuses one file index across probes and stays pruned") {
    TextOps.ensureRegistered(spark)
    val idx = java.nio.file.Files.createTempDirectory("shard_reuse").toString
    DedupShard.buildIndex(spark, DedupScale.corpus(spark, 300L), idx, nShards = 8)
    val (p1, _) = DedupShard.probe(spark, idx, 8,
      DedupStream.deltaDocs(spark, 0L, 4, 300L))
    val (p2, _) = DedupShard.probe(spark, idx, 8,
      DedupStream.deltaDocs(spark, 1L, 4, 300L))
    p1.count(); p2.count()
    // the memo hands both probes the SAME resolved table (one
    // InMemoryFileIndex — the amortized-listing contract)
    val (t1, _, _) = DedupShard.indexTables(spark, idx)
    val (t2, _, _) = DedupShard.indexTables(spark, idx)
    assert(t1 eq t2)
    // and pruning still happens per probe: a shard filter over the
    // memoized table is a partition filter, not a data filter
    val plan = t1.filter(col("shard").isin(2L, 5L))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(plan).isDefined, plan)
  }
}
