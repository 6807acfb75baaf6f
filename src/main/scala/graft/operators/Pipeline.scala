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
}
