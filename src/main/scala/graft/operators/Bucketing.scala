package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tpch

/** Bucketing for co-located joins (SCALE.md "partitioning & shuffle"):
  * the fact tables most frequently joined on the same key are written
  * ONCE as bucketed tables (hash(l_orderkey) mod N buckets, sorted
  * within buckets), after which every orderkey join between them is
  * bucket-local — no shuffle exchange on either side, and the
  * in-bucket sort order feeds SortMergeJoin without a Sort.
  *
  * At 100 TB this is the difference between re-shuffling two
  * multi-terabyte tables per join and a pure map-side merge: the
  * reference gets the same effect from id-range store partitioning
  * (MultiPassStore.java:24-230 processes co-located id ranges); Spark's
  * native form is `bucketBy` + `sortBy` on the write path.
  *
  * The bucketed twins are created lazily per (session, dir) under the
  * JVM temp dir (the catalog is session-scoped, so the memo re-creates
  * the catalog entry per session; the parquet files are overwritten,
  * not appended).
  */
object Bucketing {
  val NumBuckets = 8

  private val memo = new graft.SessionMemo[(String, String)]

  private def tables(spark: SparkSession, dir: String): (String, String) =
    memo.getOrElseUpdate(spark, dir) {
      val tag = Integer.toHexString(dir.hashCode & 0x7fffffff)
      val li = s"graft_li_bucketed_$tag"
      val ord = s"graft_ord_bucketed_$tag"
      val base = new java.io.File(sys.props("java.io.tmpdir"), s"graft_bucketed_$tag")
      if (!spark.catalog.tableExists(li)) {
        Tpch.table(spark, dir, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .write.mode("overwrite")
          .option("path", new java.io.File(base, "lineitem").getAbsolutePath)
          .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
          .format("parquet").saveAsTable(li)
      }
      if (!spark.catalog.tableExists(ord)) {
        Tpch.table(spark, dir, "orders")
          .select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite")
          .option("path", new java.io.File(base, "orders").getAbsolutePath)
          .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
          .format("parquet").saveAsTable(ord)
      }
      (li, ord)
    }

  /** Pre-creates the bucketed twins (bench warmup): the write is the
    * one-time ETL materialization, not part of steady-state query
    * cost. */
  def warm(spark: SparkSession, dir: String): Unit = {
    tables(spark, dir)
    ()
  }

  /** Revenue per order priority over the bucketed twins: the
    * lineitem⋈orders join carries no Exchange on either side (bucket
    * partitioning satisfies the join's distribution requirement) — the
    * one shuffle in the plan is the final small groupBy. */
  def revenueByPriority(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = tables(spark, dir)
    spark.table(li)
      .withColumn("rev_c",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1.0 - l_discount) * 100) AS BIGINT)"))
      .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(sum("rev_c").as("revenue_c"), count(lit(1)).as("n_items"))
  }
}
