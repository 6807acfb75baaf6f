package graft

import org.apache.spark.sql.functions._

/** The decontamination GUARANTEE, asserted as a set fact rather than
  * trusted from the rollup: after `ngramDecontaminate` drops its
  * documents, the surviving train set shares ZERO 8-grams with the
  * held-out splits — which is the entire point of the operator (a
  * single surviving shared gram means the eval still partially
  * measures memorization). Also pins the report's totals to the
  * doc-level sets it summarizes.
  */
class NgramDecontamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("kept train docs share no 8-gram with val/test; report totals match") {
    graft.operators.TextOps.ensureRegistered(spark)
    val dg = graft.operators.Pipeline.overlapGramTableOf(
      graft.operators.TextOps.tokenTable(spark, dir)).persist()
    val evalGrams = dg.filter(col("r") =!= 0L).select("gram").distinct()
    val leaky = dg.filter(col("r") === 0L)
      .join(evalGrams, "gram").select("doc_id").distinct().persist()
    val nLeaky = leaky.count()
    assert(nLeaky > 0, "fixture has no contamination to remove — vacuous test")
    // the guarantee: grams of the KEPT train docs never hit eval grams
    val keptGrams = dg.filter(col("r") === 0L)
      .join(leaky, Seq("doc_id"), "left_anti")
      .select("gram").distinct()
    val residual = keptGrams.join(evalGrams, "gram").count()
    assert(residual == 0L, s"$residual eval grams survive decontamination")
    // the per-source report sums to exactly the doc-level drop set
    val rep = graft.operators.Pipeline.ngramDecontaminate(spark, dir)
    val dropped = rep.agg(sum("n_dropped")).head.getLong(0)
    assert(dropped == nLeaky, s"report dropped $dropped != doc-level $nLeaky")
    // kept + dropped must partition the full train split (short docs
    // included — they cannot leak and must be counted as kept)
    val totals = rep.agg(sum("n_docs"), sum("n_kept")).head
    assert(totals.getLong(0) - totals.getLong(1) == nLeaky)
    dg.unpersist(); leaky.unpersist()
  }
}
