package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data
  * pipeline actually runs over raw documents:
  *
  *   quality gate → language gate → near-dup drop list → stats
  *
  * Each stage is an existing oracle-gated operator ([[TextOps.quality]],
  * [[TextOps.langId]], [[Dedup.dedupClusters]]); the value of this
  * operator is the composition itself: one declarative plan where
  * Catalyst pushes the quality filter below the joins, the drop list
  * applies as a left-anti join (never a collected blacklist), and every
  * stage's shuffle keys line up on doc_id. At 100 TB this plan shape —
  * filter early, anti-join the (small) drop side, aggregate last — is
  * the difference between a curation job that runs and one that
  * doesn't. */
object Pipeline {
  val QualityTau = 0.4 // corpus scores span ~0.23-0.62; 0.4 keeps the upper half

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val q = TextOps.quality(spark, dir)
      .select(col("doc_id"), col("quality"), col("n_tokens"))
    val lang = TextOps.langId(spark, dir).select(col("doc_id"), col("pred"))
    val drops = Dedup.dedupClusters(spark, dir)
      .filter(col("doc_id") < Dedup.IdOffset) // originals only
      .select("doc_id")
    q.filter(col("quality") >= QualityTau)
      .join(lang, "doc_id")
      .join(drops, Seq("doc_id"), "left_anti")
      .groupBy(col("pred").as("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
  }

  /** Deterministic token-budget sampling per source stratum — the
    * training-mix curation step (sample each domain down to its char
    * budget, reproducibly, with no RNG): docs order by a Knuth
    * multiplicative hash of doc_id (injective mod the prime, so the
    * "random" order is total and seedless-reproducible on any engine),
    * a per-source running char total marks the budget cut, and the
    * output reports each stratum's take.
    *
    * The window is partitioned by source — at 100 TB each stratum's
    * cumsum is one partition-local sort, no global ordering anywhere.
    * A skewed giant stratum can range-partition on (source, h) with
    * per-range offsets; this corpus doesn't need it. */
  val SampleMult = 2654435761L
  val SampleMod = 1000000007L
  val BudgetChars = 4000L

  /** Curation v2 — this round's gates composed into one declarative
    * plan: repetition keep ∧ not majority-duplicated (cross-doc
    * substring coverage < half) ∧ per-source char budget over the
    * SURVIVORS. Each stage is an oracle-gated operator; the value is
    * the composition — every join keys on doc_id, the budget window
    * stays partition-local per source, and Catalyst pushes the cheap
    * gates below the joins. */
  def curateV2(spark: SparkSession, dir: String): DataFrame = {
    val rep = TextOps.repetition(spark, dir).select(col("doc_id"), col("keep"))
    val sub = Dedup.substringDup(spark, dir)
      .select(col("doc_id"), col("n_grams"), col("dup_occ"))
    val d = TextOps.docs(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        pmod(col("doc_id") * SampleMult, lit(SampleMod)).as("h"))
    val kept = d.join(rep, "doc_id").join(sub, "doc_id")
      .filter(col("keep") === 1L && col("dup_occ") * 2 <= col("n_grams"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("h")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    kept.withColumn("cum", sum("n_chars").over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("cum") <= BudgetChars, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("cum") <= BudgetChars, col("n_chars")).otherwise(0L))
          .as("chars_kept"))
  }

  def sampleBudget(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("h")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    TextOps.docs(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        pmod(col("doc_id") * SampleMult, lit(SampleMod)).as("h"))
      .withColumn("cum", sum("n_chars").over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("cum") <= BudgetChars, 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("cum") <= BudgetChars, col("n_chars")).otherwise(0L)).as("chars_sampled"))
  }
}
