package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under the given scale-factor directory.
  * All engine queries take the directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench)
  * — and, unchanged, against a 100 TB partitioned table directory on a
  * real cluster (spark.read.parquet handles multi-file/partitioned
  * layouts transparently).
  */
object Tpch {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
