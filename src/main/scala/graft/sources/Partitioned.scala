package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout — the storage discipline that makes
  * a 100 TB event table queryable at all: data lands under
  * `event_date=YYYY-MM-DD/` directories, and any date-bounded query
  * prunes to the matching directories at PLANNING time (the scan's
  * `PartitionFilters`), reading none of the other days' bytes.
  *
  * Mirrors the reference's practice of rotating logs to dated
  * boundaries before streaming them (ServerUtil.java:126-180 rotates
  * to a consistent boundary; the analytics twin of that boundary is
  * the partition directory). The spec pins the plan fact: a one-day
  * read over the partitioned layout carries the date in
  * `PartitionFilters`, not in a post-scan filter.
  */
object Partitioned {
  val DateCol = "event_date"

  /** Land an event table partitioned by event date. Partition values
    * derive from `ts`, so a writer needs no external calendar; files
    * within a day stay splittable parquet. */
  def writeByDay(ev: DataFrame, path: String): Unit =
    ev.withColumn(DateCol, to_date(col("ts")))
      .write.mode("overwrite").partitionBy(DateCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** A date-bounded read — the filter compares against the PARTITION
    * column, which Spark resolves against directory names during
    * planning (partition pruning), never by scanning file contents. */
  def readDays(spark: SparkSession, path: String,
               from: String, until: String): DataFrame =
    read(spark, path)
      .filter(col(DateCol) >= lit(from) && col(DateCol) <= lit(until))
}
