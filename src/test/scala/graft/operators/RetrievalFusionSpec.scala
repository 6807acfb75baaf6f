package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** rrfFusion / tfidfKeywords invariants on the sf0.001 corpus:
  * fusion scores bound by the arm formula, every fused doc traces back
  * to at least one arm, and TF-IDF ranks are dense per doc. */
class RetrievalFusionSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("rrf scores are the exact sum of per-arm reciprocal-rank terms") {
    val fused = TextOps.rrfFusion(spark, dir)
    // every contribution is Scale div (K + rank) with rank in 1..TopK,
    // so a single-arm doc is bounded by the rank-1 term and a two-arm
    // doc by twice that
    val maxSingle = TextOps.RrfScale / (TextOps.RrfK + 1)
    val bad = fused.filter(
      (col("n_arms") === 1L && col("rrf") > maxSingle) ||
        (col("n_arms") === 2L && col("rrf") > 2L * maxSingle) ||
        col("n_arms") > 2L || col("n_arms") < 1L)
    assert(bad.count() === 0L)
    // ranks are dense 1..k per query
    val perQ = fused.groupBy("qid")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(perQ.count() === 0L)
  }

  test("every fused doc appears in at least one arm's top-k") {
    val fused = TextOps.rrfFusion(spark, dir).select("qid", "doc_id")
    val armA = TextOps.bm25TopDocs(spark, dir).select("qid", "doc_id")
    // a doc fused with n_arms >= 1 must be in BM25's list or carry a
    // tf-product rank; armA alone must cover every n_arms=2 doc
    val both = TextOps.rrfFusion(spark, dir)
      .filter(col("n_arms") === 2L).select("qid", "doc_id")
    assert(both.join(armA, Seq("qid", "doc_id"), "left_anti").count() === 0L)
    assert(fused.count() > 0L)
  }

  test("tfidf ranks are dense, capped at TopK, and scores non-increasing") {
    val kw = TextOps.tfidfKeywords(spark, dir)
    assert(kw.filter(col("rank") > TextOps.TfidfTopK).count() === 0L)
    // within a doc, score at rank r is >= score at rank r+1
    val a = kw.select(col("doc_id"), col("rank"), col("score"))
    val b = kw.select(col("doc_id"), (col("rank") - 1L).as("rank"),
      col("score").as("next_score"))
    val inv = a.join(b, Seq("doc_id", "rank"))
      .filter(col("next_score") > col("score"))
    assert(inv.count() === 0L)
    // dense: per-doc max rank == row count
    val dense = kw.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .filter(col("n") =!= col("mx"))
    assert(dense.count() === 0L)
  }
}
