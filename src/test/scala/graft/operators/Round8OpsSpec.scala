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
}
