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
    srcs.foreach { case (fam, pairs) =>
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
