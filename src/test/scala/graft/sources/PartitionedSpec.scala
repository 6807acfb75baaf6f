package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** Partition-pruning facts: a date-bounded read over the partitioned
  * layout must resolve the date bound against directory names at
  * planning time (PartitionFilters), not scan-and-filter. */
class PartitionedSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("date-partitioned layout prunes to the requested days at planning time") {
    val ev = EventStreams.events(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    Partitioned.writeByDay(ev, path)

    // pick a real one-day range from the data
    val day = ev.select(to_date(col("ts")).as("d"))
      .groupBy("d").count().orderBy(col("count").desc, col("d"))
      .head().getDate(0).toString

    val pruned = Partitioned.readDays(spark, path, day, day)
    // correctness: pruned read == full-scan filter
    val expected = ev.filter(to_date(col("ts")) === lit(day)).count()
    assert(pruned.count() === expected)
    assert(expected > 0L)

    // plan facts: the date bound is a PartitionFilter on the scan —
    // planning-time directory pruning, not a post-scan Filter
    val plan = pruned.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters:"), plan)
    assert(scanLine.contains("event_date"), plan)
    // and the partition column never appears in the data-file schema
    assert(!scanLine.replaceAll(".*ReadSchema", "").contains("event_date"), plan)
  }

  test("pruned scan reads only the selected day's files") {
    val ev = EventStreams.events(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_part2").toString
    Partitioned.writeByDay(ev, path)
    val days = ev.select(to_date(col("ts")).as("d")).distinct().count()
    assert(days > 1L) // the layout actually has multiple partitions
    val day = ev.select(to_date(col("ts")).as("d")).agg(min("d"))
      .head().getDate(0).toString
    val pruned = Partitioned.readDays(spark, path, day, day)
    // file accounting from the scan's own execution metrics
    // (DataFrame.inputFiles ignores partition pruning — it lists the
    // whole relation)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val plan = df.queryExecution.executedPlan
      val scan = plan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.get
      // run THIS plan instance — df.count() would build a fresh
      // QueryExecution whose metrics never touch `scan`
      plan.execute().count()
      scan.metrics("numFiles").value
    }
    val all = filesRead(Partitioned.read(spark, path))
    val one = filesRead(pruned)
    assert(one >= 1L)
    assert(one < all, s"pruned scan read $one of $all files")
  }
}
