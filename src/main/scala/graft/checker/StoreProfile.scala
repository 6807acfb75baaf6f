package graft.checker

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Stores

/** Per-store profile (count + modular pointer checksums) of the record
  * derivation — the parity probe comparing [[graft.model.RecordStores]]
  * against the oracle's SQL twin. Modulo 1000003 keeps sums within
  * BIGINT at any scale factor. */
object StoreProfile {
  private val M = 1000003L

  /** A6 analog — the reference's cache counters (its
    * consistency-check monitors report per-cache hit/miss/size;
    * enterprise-performance-tests wires a page-cache monitor into the
    * run): on this engine the equivalent runtime surface is the block
    * manager's storage state. One row summarizing every cached RDD —
    * count, partitions cached, memory and disk bytes. Values are
    * runtime-dependent by nature (exactly like the reference's
    * counters), so the query carries a rows-only check, not a DuckDB
    * twin; the spec pins the schema and that a persisted table is
    * visible. Driver-side cost is the storage-info list — bounded by
    * the number of cached RDDs, never by data. */
  def cacheCounters(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val infos = spark.sparkContext.getRDDStorageInfo.toSeq
    Seq((
      infos.size.toLong,
      infos.map(_.numCachedPartitions.toLong).sum,
      infos.map(_.memSize).sum,
      infos.map(_.diskSize).sum
    )).toDF("n_cached_rdds", "partitions_cached", "mem_bytes", "disk_bytes")
  }

  def profile(s: Stores): DataFrame = {
    def p(df: DataFrame, store: String, s1: Column, s2: Column): DataFrame =
      df.agg(count(lit(1)).as("n"),
        coalesce(sum(s1), lit(0L)).as("s1"),
        coalesce(sum(s2), lit(0L)).as("s2"))
        .select(lit(store).as("store"), col("n"), col("s1"), col("s2"))
    p(s.nodes, "nodes", col("next_rel") % M, col("next_prop") % M)
      .unionAll(p(s.rels, "rels",
        (col("first_prev") + col("first_next")) % M,
        (col("second_prev") + col("second_next")) % M))
      .unionAll(p(s.neo, "neo", col("next_prop") % M, lit(0L)))
      .unionAll(p(s.props, "props", col("prev_prop") % M, col("next_prop") % M))
      .unionAll(p(s.blocks, "blocks", col("value_ref") % M,
        col("vlen") + col("key_id") * 31 + col("ptype")))
      .unionAll(p(s.dyns, "dyns", col("next_block") % M, col("length")))
      .unionAll(p(s.arrays, "arrays", col("next_block") % M, col("length")))
  }
}
