package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-8 additions: the occupancy-capped corpus×corpus candidate
  * path (`Similarity.knnCandidates` / `knnTopK`) and its audit probe
  * (`bucketStats`). The sf corpora never cross `KnnBucketCap`, so the
  * cap machinery is exercised here on a generated corpus wide enough
  * to trigger both refinement and slicing. */
class Round8OpsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** a corpus that genuinely overfills buckets: AnnScale's 50-cluster
    * generator at n=8000 puts ~160 near-identical vectors per cluster,
    * and clusters concentrate into few coarse buckets. */
  private def wideCorpus: DataFrame = {
    TextOps.ensureRegistered(spark)
    Similarity.withBucket(AnnScale.vectors(spark, 8000))
      .select(col("vec_id"), col("q"), col("nrm"), col("bucket"))
  }

  /** the r7 window form, kept as the reference semantics. */
  private def windowTopK(e: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    Similarity.knnCandidates(e)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid")
  }

  test("knnTopK aggregate form equals the row_number window form (sf corpus)") {
    TextOps.ensureRegistered(spark)
    val e = Similarity.withBucket(
      Similarity.quantized(spark, dir)).persist()
    val agg = Similarity.knnTopK(e, Similarity.KnnGraphK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = windowTopK(e, Similarity.KnnGraphK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(agg === win)
    assert(agg.nonEmpty)
    e.unpersist()
    ()
  }

  test("knnTopK aggregate form equals the window form on a corpus that triggers the cap") {
    val e = wideCorpus.persist()
    val agg = Similarity.knnTopK(e, Similarity.KnnGraphK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = windowTopK(e, Similarity.KnnGraphK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(agg === win)
    e.unpersist()
    ()
  }

  test("slicedGroups bounds candidate groups on an overfull corpus") {
    val e = wideCorpus.persist()
    val g = Similarity.slicedGroups(e).persist()
    // the cap machinery actually fired: at 8000 clustered vectors some
    // coarse bucket must exceed KnnBucketCap
    val refined = g.filter(col("occ0") > Similarity.KnnBucketCap)
      .select("bucket").distinct().count()
    assert(refined > 0, "expected at least one refined bucket")
    // the hard bound: no final (key1, slice) unit exceeds ~2×cap (the
    // hash slice is near-uniform, not exact — 2× is the skew allowance)
    val maxUnit = g.groupBy("key1", "slice").agg(count(lit(1)).as("n"))
      .agg(max("n")).head.getLong(0)
    assert(maxUnit <= 2L * Similarity.KnnBucketCap,
      s"final group width $maxUnit exceeds 2×cap")
    // every vector appears exactly once
    assert(g.count() === e.count())
    g.unpersist(); e.unpersist()
    ()
  }

  test("knnTopK plans with no exchange between the candidate join and the top-k aggregate") {
    TextOps.ensureRegistered(spark)
    val e = Similarity.withBucket(Similarity.quantized(spark, dir))
    val p = Similarity.knnTopK(e, Similarity.KnnGraphK)
      .queryExecution.executedPlan.toString
    // the join's (key1, slice) partitioning must satisfy the
    // (key1, slice, qid) grouping — a qid-keyed exchange above the
    // join is the r8 anti-shape (it re-shuffles all N·cap scored pairs)
    val qidExchange = raw"Exchange hashpartitioning\(qid#\d+L".r
    assert(qidExchange.findFirstIn(p).isEmpty, p)
  }

  test("bucketStats: internally consistent occupancy summary (sf corpus)") {
    val r = Similarity.bucketStats(spark, dir).head
    val (nVec, nBuckets, maxBucket) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (refined, nGroups, slicedG) = (r.getLong(3), r.getLong(4), r.getLong(5))
    val (nUnits, maxUnit) = (r.getLong(6), r.getLong(7))
    assert(nVec > 0 && nBuckets > 0)
    assert(maxBucket <= nVec)
    assert(nGroups >= nBuckets - refined) // refinement only splits
    assert(nUnits >= nGroups - slicedG)
    assert(maxUnit <= maxBucket)
  }

  test("winnow: guarantee + density — every window selects, density near 2/(w+1)") {
    val rows = TextOps.winnow(spark, dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (nGrams, nWin, nSel, nFp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nWin === math.max(nGrams - (TextOps.WinnowW - 1), 0L))
      assert(nSel <= nWin)              // ≤ one new selection per window
      assert(nFp <= nSel)
      if (nWin > 0) assert(nSel >= 1L)  // the winnowing guarantee
    }
    // expected density of random hashes is 2/(w+1) = 0.2; real text
    // repeats grams so allow a wide band, but catch degenerate
    // select-everything / select-nothing bugs
    val d = rows.filter(_.getLong(2) > 0)
      .map(r => r.getLong(3).toDouble / r.getLong(2)).sum / rows.length
    assert(d > 0.1 && d < 0.8, s"mean density $d")
  }

  test("winnowPairs: the MOSS guarantee finds planted local overlap") {
    import spark.implicits._
    // two docs sharing one long span, one unrelated — selection over a
    // shared span of ≥ K+W-1 chars MUST yield a shared fingerprint
    val span = "the identical copied paragraph lives inside both documents"
    val corpus = Seq(
      (1L, s"alpha beta gamma $span delta epsilon"),
      (2L, s"zeta eta theta iota $span kappa"),
      (3L, "completely unrelated text with nothing in common at all"))
      .toDF("doc_id", "text")
    TextOps.ensureRegistered(spark)
    // run the same selection the operator uses, via a temp-view corpus
    val fps = TextOps.winnowSelectedOf(corpus)
      .select(col("doc_id"), col("h")).distinct()
    val shared = fps.filter(col("doc_id") === 1L)
      .join(fps.filter(col("doc_id") === 2L), "h").count()
    assert(shared >= 1, "shared span produced no shared fingerprint")
  }

  test("codeDetect: probe docs flag as code, non-probe corpus does not") {
    val rows = TextOps.codeDetect(spark, dir).collect()
    val (probe, rest) = rows.partition(_.getLong(0) % TextOps.CodeMod == 0)
    assert(probe.nonEmpty && rest.nonEmpty)
    // every probe doc gained code-shaped lines and symbols
    probe.foreach { r =>
      assert(r.getLong(2) >= 2, s"doc ${r.getLong(0)}: n_code_lines")
      assert(r.getLong(5) >= 2, s"doc ${r.getLong(0)}: n_snake")
    }
    // prose corpus: no code-shaped lines at all
    rest.foreach { r => assert(r.getLong(2) === 0L) }
  }

  test("dsirWeights: en docs score higher than non-en on average") {
    val w = graft.operators.Pipeline.dsirWeights(spark, dir)
    val lang = TextOps.docs(spark, dir).select(col("doc_id"), col("lang"))
    val by = w.join(lang, "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("avg_micro")).as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(by(true) > by(false),
      s"en ${by(true)} should beat non-en ${by(false)}")
    assert(by.values.forall(_ > 0.0))
  }

  test("dsirSample: en selects above its share, every other lang below") {
    val rows = graft.operators.Pipeline.dsirSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val en = rows.find(_._1 == "en").get
    val others = rows.filter(_._1 != "en")
    assert(en._4 > 0.5, s"en rate ${en._4}")
    others.foreach { o =>
      assert(o._4 < en._4, s"${o._1} rate ${o._4} >= en ${en._4}")
    }
    // the threshold partitions the corpus non-trivially
    val sel = rows.map(_._3).sum
    val tot = rows.map(_._2).sum
    assert(sel > 0 && sel < tot)
  }

  test("sourceMix: q is a distribution, temperature flattens toward uniform") {
    val rows = graft.operators.Pipeline.sourceMix(spark, dir).collect()
    assert(rows.length > 1)
    val (ps, qs) = (rows.map(_.getDouble(3)), rows.map(_.getDouble(4)))
    assert(math.abs(ps.sum - 1.0) < 1e-9 && math.abs(qs.sum - 1.0) < 1e-9)
    // α < 1 compresses the mixture: boost = p^(α−1)/Z is strictly
    // decreasing in p, so the smallest source is upsampled relative
    // to the largest
    val byP = rows.sortBy(_.getDouble(3))
    val boosts = byP.map(_.getDouble(5))
    boosts.zip(boosts.tail).foreach { case (hi, lo) =>
      assert(hi >= lo - 1e-12, s"boost not monotone: $hi then $lo")
    }
    assert(boosts.head > boosts.last)
  }

  test("matryoshkaRecall: recall grows with prefix dims") {
    // the synthetic embeddings are near-isotropic (no Matryoshka
    // training), so absolute prefix recall is LOW by construction —
    // the invariants are shape, monotonicity, and a non-degenerate
    // 32-dim signal (measured 0.26 vs 0.06 at 16 dims on sf0.001)
    val r = Similarity.matryoshkaRecall(spark, dir).collect()
      .map(x => (x.getLong(0), x.getDouble(3))).toMap
    assert(r.keySet === Similarity.MatryoshkaDims.map(_.toLong).toSet)
    assert(r(16L) <= r(32L) + 1e-9, s"recall not monotone: $r")
    assert(r(32L) >= 0.1, s"32-dim prefix recall ${r(32L)}")
    assert(r.values.forall(v => v >= 0.0 && v <= 1.0))
  }
}
