package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-4 curation surface: exact-substring duplication, repetition
  * gates, token-budget sampling. */
class CurationOpsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("substringDup invariants: coverage bounded, duplication symmetric and present") {
    val out = Dedup.substringDup(spark, dir).persist()
    // every document of the corpus appears exactly once
    assert(out.count() === TextOps.docs(spark, dir).count())
    // occurrences of duplicated grams can never exceed total windows,
    // and distinct duplicated grams never exceed their occurrences
    assert(out.filter(col("dup_occ") > col("n_grams")).count() === 0L)
    assert(out.filter(col("dup_grams") > col("dup_occ")).count() === 0L)
    // a duplicated substring needs ≥2 docs carrying it: the corpus-wide
    // count of docs with dup coverage is 0 or ≥2, never exactly 1
    val nDup = out.filter(col("dup_occ") > 0).count()
    assert(nDup === 0L || nDup >= 2L)
  }

  test("repetition flags a hand-planted repetitious doc and passes diverse text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat while a dog barked far away today"),
      (2L, Seq.fill(20)("buy now limited offer").mkString(" ")))
      .toDF("doc_id", "text")
    // run the same grams→counts pipeline via a temp view of TextOps'
    // public pieces: reuse operator on a fake dir is not possible, so
    // assert on the corpus + the planted doc through the internal path
    val t = docs.withColumn("t", TextOps.toks(col("text")))
    TextOps.ensureRegistered(spark)
    def counts(n: Int) = t.filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(t) - $n), j -> array_join(slice(t, j + 1, $n), ' '))"))
        .as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("n"))
    val top2 = counts(2).groupBy("doc_id")
      .agg((max("n") / sum("n")).as("top2_frac")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top2(1L) <= TextOps.RepTop2Tau) // diverse: max bigram appears twice? no — once
    assert(top2(2L) > TextOps.RepTop2Tau)  // "offer buy"/"buy now"… dominate
  }

  test("repetition on the corpus: fractions in [0,1] and some docs kept") {
    val out = TextOps.repetition(spark, dir).persist()
    assert(out.filter(col("top2_frac") < 0 || col("top2_frac") > 1).count() === 0L)
    assert(out.filter(col("dup3_frac") < 0 || col("dup3_frac") > 1).count() === 0L)
    assert(out.filter(col("keep") === 1L).count() > 0L)
  }

  test("incrementalPairs: every pair touches the delta, twins found") {
    val out = Dedup.incrementalPairs(spark, dir).persist()
    val off = 2 * Dedup.IdOffset
    // the incremental contract: only pairs involving a delta doc
    assert(out.filter(col("a") < off && col("b") < off).count() === 0L)
    // a head-trimmed variant keeps most shingles: originals must pair
    // with their delta twins for a healthy majority of the delta slice
    val twins = out.filter(col("b") === col("a") + off).count()
    val nDelta = Dedup.deltaCorpus(spark, dir).count()
    assert(twins * 2 >= nDelta, s"$twins twins of $nDelta delta docs")
  }

  test("modalityRoute conserves blobs and bytes across the demux") {
    val docs = TextOps.docs(spark, dir)
    val out = Media.modalityRoute(spark, dir).persist()
    assert(out.agg(sum("n_blobs")).collect().head.getLong(0) === docs.count())
    assert(out.agg(sum("total_bytes")).collect().head.getLong(0) ===
      docs.agg(sum(length(col("text")))).collect().head.getLong(0))
  }

  test("dimStats: one row per dimension, n = corpus size each") {
    val out = Similarity.dimStats(spark, dir).persist()
    val nVecs = graft.sources.Tpch.table(spark, dir, "embeddings").count()
    assert(out.count() === 64L)
    assert(out.filter(col("n") =!= nVecs).count() === 0L)
    assert(out.filter(col("min_q") > col("max_q")).count() === 0L)
  }

  test("sampleBudget: every stratum under budget, deterministic across runs") {
    val a = Pipeline.sampleBudget(spark, dir).persist()
    // chars_sampled never exceeds the budget (cut is on running total)
    assert(a.filter(col("chars_sampled") > Pipeline.BudgetChars).count() === 0L)
    assert(a.filter(col("n_sampled") > col("n_total")).count() === 0L)
    // at least one doc sampled per stratum (first doc is ~300 chars)
    assert(a.filter(col("n_sampled") === 0L).count() === 0L)
    // bit-deterministic: a second run produces the identical table
    val b = Pipeline.sampleBudget(spark, dir)
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }
}
