package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-12 additions: the per-family cross-source duplication audit's
  * completeness (every family's pairs counted exactly once, strong ≤
  * total), the dataset card's audit rollups (each a recomputable
  * aggregate of the table it summarizes), the single-pass bandSweep's
  * equivalence to the per-config form it replaced, and the
  * deterministic-recompute memo migration (second touch is the same
  * cached frame, not a rebuild).
  */
class Round12OpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("dupSources: per family, cells sum to that family's pair table; strong <= pairs; canonical source order") {
    TextOps.ensureRegistered(spark)
    val m = Pipeline.dupSources(spark, dir).collect()
    val srcs = Pipeline.leakagePairSources(spark, dir)
    assert(m.map(_.getAs[String]("family")).toSet === srcs.map(_._1).toSet)
    srcs.foreach { case (fam, pairs, _) =>
      val cells = m.filter(_.getAs[String]("family") == fam)
      // the base-doc fold + source join is total (every folded id is a
      // document), so the per-family cell sum must equal the pair count
      assert(cells.map(_.getAs[Long]("n_pairs")).sum === pairs.count(),
        s"family $fam cells do not sum to its pair table")
      cells.foreach { r =>
        assert(r.getAs[Long]("n_strong") <= r.getAs[Long]("n_pairs"))
        assert(r.getAs[String]("source_lo") <= r.getAs[String]("source_hi"))
      }
    }
  }

  test("leakageFamilies covers the semantic family, and its cells sum to the embedding pair table") {
    TextOps.ensureRegistered(spark)
    val m = Pipeline.leakageFamilies(spark, dir).collect()
    val sem = m.filter(_.getAs[String]("family") == "semantic")
    assert(sem.nonEmpty, "no semantic family rows in the leakage audit")
    assert(sem.map(_.getAs[Long]("n_pairs")).sum ===
      Similarity.embeddingDup(spark, dir).count())
  }

  test("datasetCard rollups equal independent recomputation of the audits they fold in") {
    TextOps.ensureRegistered(spark)
    val card = Pipeline.datasetCard(spark, dir).collect().head
    val leak = Pipeline.leakageFamilies(spark, dir)
      .filter(col("split_a") =!= col("split_b")).collect()
    assert(card.getAs[Long]("leak_pairs") ===
      leak.map(_.getAs[Long]("n_pairs")).sum)
    assert(card.getAs[Long]("leak_families") ===
      leak.map(_.getAs[String]("family")).distinct.length)
    val xs = Pipeline.dupSources(spark, dir)
      .filter(col("source_lo") =!= col("source_hi")).collect()
    assert(card.getAs[Long]("cross_src_pairs") ===
      xs.map(_.getAs[Long]("n_pairs")).sum)
    assert(card.getAs[Long]("cross_src_strong") ===
      xs.map(_.getAs[Long]("n_strong")).sum)
    val shortfall = Pipeline.epochPlan(spark, dir).collect()
      .map(_.getAs[Double]("shortfall")).sum
    assert(card.getAs[Long]("plan_shortfall_tokens") === math.round(shortfall))
  }

  test("bandSweep single pass equals the per-config union form it replaced") {
    TextOps.ensureRegistered(spark)
    // reference implementation: one select per config over the joined
    // pair table, unioned — the r11 shape (3x the work, same rows)
    val sh = Dedup.nearShingles(spark, dir)
    val mhCols = (0 until Dedup.NumHashes).map { i =>
      min(expr(s"((${1 + 7919 * i}) * sfp + ${104729 * i}) % ${TextOps.P}")).as(s"mh$i")
    }
    val sig = sh.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
    def side(p: String) = sig.select(
      col("doc_id").as(p) +:
        (0 until Dedup.NumHashes).map(i => col(s"mh$i").as(s"${p}_mh$i")): _*)
    val pairs = Dedup.ngramJaccard(spark, dir).select("a", "b", "jacc")
      .join(side("a"), "a").join(side("b"), "b")
    val expected = Seq(2 -> 8, 4 -> 4, 8 -> 2).map { case (bnds, rws) =>
      val det = (0 until bnds).map { g =>
        (g * rws until (g + 1) * rws)
          .map(i => col(s"a_mh$i") === col(s"b_mh$i")).reduce(_ && _)
      }.reduce(_ || _)
      pairs.select(lit(s"b${bnds}r$rws").as("config"),
        floor(col("jacc") * 10).cast("long").as("j_decile"),
        when(det, 1L).otherwise(0L).as("det"))
    }.reduce(_ unionAll _)
      .groupBy("config", "j_decile")
      .agg(count(lit(1)).as("n_pairs"), sum("det").as("n_detected"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val got = Dedup.bandSweep(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
  }

  test("ngramOverlap: val/test rows only; doc counts match the split census; hits bounded; rate consistent") {
    TextOps.ensureRegistered(spark)
    val out = Pipeline.ngramOverlap(spark, dir).collect()
    assert(out.map(_.getAs[String]("split")).toSet.subsetOf(Set("val", "test")))
    // n_docs per split = docs with >= OverlapN tokens in that split
    // (shorter docs have no gram to leak — excluded by construction)
    val census = TextOps.tokenTable(spark, dir)
      .filter(size(col("t")) >= Pipeline.OverlapN)
      .select(col("doc_id"))
      .collect().map(_.getLong(0))
      .groupBy { id =>
        val b = math.floorMod(math.floorMod(id * Pipeline.SplitMult,
          Pipeline.SampleMod), 100L)
        if (b < 80) "train" else if (b < 90) "val" else "test"
      }.map { case (k, v) => k -> v.length.toLong }
    out.foreach { r =>
      val s = r.getAs[String]("split")
      assert(r.getAs[Long]("n_docs") === census(s), s)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_grams"), s)
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_docs"), s)
      assert(r.getAs[Double]("hit_rate") ===
        r.getAs[Long]("n_hits").toDouble / r.getAs[Long]("n_grams"), s)
    }
  }

  test("migrated deterministic-recompute operators memoize: second touch returns the cached frame") {
    TextOps.ensureRegistered(spark)
    val touches: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("it_connected_components", () => Iterative.connectedComponents(spark, dir)),
      ("it_lpa", () => Iterative.labelPropagation(spark, dir)),
      ("it_bfs_depth", () => Iterative.bfsDepth(spark, dir)),
      ("it_kcore", () => Iterative.kcore(spark, dir)),
      ("g_expand_directions", () => GraphOps.expandBothDirections(spark, dir)),
      ("g_basket_features", () => GraphOps.basketFeatures(spark, dir)),
      ("t_rrf", () => TextOps.rrfFusion(spark, dir)),
      ("t_tfidf", () => TextOps.tfidfKeywords(spark, dir)),
      ("emb_knn_graph", () => Similarity.knnGraph(spark, dir)),
      ("dd_embedding", () => Similarity.embeddingDup(spark, dir)),
      ("dd_band_sweep", () => Dedup.bandSweep(spark, dir)),
      ("pipe_leakage_families", () => Pipeline.leakageFamilies(spark, dir)),
      ("pipe_dup_sources", () => Pipeline.dupSources(spark, dir)),
      ("pipe_dataset_card", () => Pipeline.datasetCard(spark, dir)))
    touches.foreach { case (name, f) =>
      val first = f()
      assert(f() eq first, s"$name rebuilt on second touch — memo missing")
    }
  }
}
