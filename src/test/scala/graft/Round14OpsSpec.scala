package graft

import org.apache.spark.sql.functions._

/** Round-14 gates: the decontamination ACTION composed into the
  * release path must carry the audit's guarantee (kept train set
  * gram-disjoint from eval) and reconcile row-for-row with the
  * `pipe_decontam_ngram` report; the dataset card's new
  * contamination columns must equal independent recomputation from
  * the audits they quote (VERDICT r13 Next #2/#3).
  */
class Round14OpsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("curateV3's assembled train set shares no 8-gram with val/test") {
    graft.operators.TextOps.ensureRegistered(spark)
    val kept = graft.operators.Pipeline.decontamTrainDocs(spark, dir)
      .select("doc_id").persist()
    val dg = graft.operators.Pipeline.overlapGramTableOf(
      graft.operators.TextOps.tokenTable(spark, dir)).persist()
    val evalGrams = dg.filter(col("r") =!= 0L).select("gram").distinct()
    val keptGrams = dg.join(kept, "doc_id").select("gram").distinct()
    val residual = keptGrams.join(evalGrams, "gram").count()
    assert(residual == 0L,
      s"$residual eval grams survive in the v3 release train set")
    // non-vacuous: the drop actually removed documents
    val nTrain = dg.filter(col("r") === 0L).select("doc_id").distinct().count()
    assert(kept.count() < nTrain, "no leaky docs dropped — vacuous fixture")
    kept.unpersist(); dg.unpersist()
  }

  test("curateV3 lineage reconciles with the decontamination report") {
    val v3 = graft.operators.Pipeline.curateV3(spark, dir)
      .select(col("source"), col("n_docs"), col("total_tokens"), col("n_seqs"))
    val rep = graft.operators.Pipeline.ngramDecontaminate(spark, dir)
      .select(col("source"), col("n_kept"))
    // per-source doc counts: the release path keeps EXACTLY the
    // report's kept set (an inner join + any-mismatch filter is empty)
    val mism = v3.join(rep, "source")
      .filter(col("n_docs") =!= col("n_kept")).count()
    assert(mism == 0L, "per-source v3 doc counts diverge from n_kept")
    // same source coverage on both sides
    assert(v3.select("source").exceptAll(rep.select("source")).count() == 0L)
    assert(rep.select("source").exceptAll(v3.select("source")).count() == 0L)
    // packing sanity: every source packs at least one sequence and the
    // sequence count never exceeds the doc count
    assert(v3.filter(col("n_seqs") < 1 || col("n_seqs") > col("n_docs"))
      .count() == 0L)
  }

  test("bloom-symmetric decontamination is output-identical to the exact path") {
    val exact = graft.operators.Pipeline.ngramDecontaminate(spark, dir)
      .collect().map(_.toSeq).toSet
    val bloom = graft.operators.Pipeline.ngramDecontaminateBloom(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(bloom == exact)
    assert(bloom.nonEmpty)
  }

  test("dataset card contamination columns equal independent recomputation") {
    val card = graft.operators.Pipeline.datasetCard(spark, dir).head()
    val ov = graft.operators.Pipeline.ngramOverlap(spark, dir)
      .select("split", "n_grams", "n_hits", "n_contaminated")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val valC = ov.get("val").map(_._3).getOrElse(0L)
    val testC = ov.get("test").map(_._3).getOrElse(0L)
    val hitRate = ov.values.map(_._2).sum.toDouble / ov.values.map(_._1).sum
    assert(card.getAs[Long]("contam_val_docs") == valC)
    assert(card.getAs[Long]("contam_test_docs") == testC)
    assert(math.abs(card.getAs[Double]("contam_hit_rate") - hitRate) < 1e-12)
    val rep = graft.operators.Pipeline.ngramDecontaminate(spark, dir)
      .agg(sum("n_dropped"), sum("n_kept")).head()
    assert(card.getAs[Long]("decontam_dropped_docs") == rep.getLong(0))
    assert(card.getAs[Long]("decontam_kept_docs") == rep.getLong(1))
    // the card's totals stay internally consistent: dropped + kept
    // partitions the train split the v3 release assembles from
    val v3docs = graft.operators.Pipeline.curateV3(spark, dir)
      .agg(sum("n_docs")).head().getLong(0)
    assert(card.getAs[Long]("decontam_kept_docs") == v3docs)
  }
}
