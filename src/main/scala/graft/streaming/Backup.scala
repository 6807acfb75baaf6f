package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Online-backup surface (SURVEY.md §3.3): full snapshot + incremental
  * change shipping by watermark, mirroring the reference's
  * BackupService (full: rotateLogsAndStreamStoreFiles,
  * ServerUtil.java:126-180; incremental: txs in (lastApplied, end],
  * ServerUtil.java:336-355; lifecycle TestBackup.java:220
  * fullThenIncremental).
  *
  * The backup location is a parquet directory per table plus a
  * `_watermark` file holding the last applied event id (the
  * RequestContext lastAppliedTransactions analog). Incremental ships
  * only rows with event_id > watermark and advances it — idempotent
  * under re-run (empty increment).
  */
object Backup {
  private def watermarkPath(dir: String) = Paths.get(dir, "_watermark")

  def readWatermark(dir: String): Long = {
    val p = watermarkPath(dir)
    if (Files.exists(p)) Files.readString(p).trim.toLong else -1L
  }

  private def writeWatermark(dir: String, w: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(watermarkPath(dir), w.toString)
  }

  /** S5: full snapshot of the event log up to its current max id. */
  def full(spark: SparkSession, ev: DataFrame, dir: String): Long = {
    val w = ev.agg(coalesce(max("event_id"), lit(-1L))).head().getLong(0)
    ev.write.mode("overwrite").parquet(s"$dir/events")
    writeWatermark(dir, w)
    w
  }

  /** S6/S7: append only the rows beyond the stored watermark, advance
    * it. Returns the number of rows shipped. */
  def incremental(spark: SparkSession, ev: DataFrame, dir: String): Long = {
    val last = readWatermark(dir)
    val inc = ev.filter(col("event_id") > last)
    val n = inc.count()
    if (n > 0) {
      inc.write.mode("append").parquet(s"$dir/events")
      val w = ev.agg(max("event_id")).head().getLong(0)
      writeWatermark(dir, w)
    }
    n
  }

  /** RebuildFromLogs: replay the backed-up log into state
    * (RebuildFromLogs.java:60-150 — replay then verify). */
  def rebuildState(spark: SparkSession, dir: String): DataFrame =
    EventStreams.userState(
      spark.read.parquet(s"$dir/events")
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)")))

  /** Verify-after-restore: the reference never trusts a backup until a
    * full consistency check runs over the restored copy
    * (BackupService.java:99-102 bootstraps a consistency check after
    * the backup completes; RebuildFromLogs.java:60-150 is
    * replay-THEN-check). Here the restored replay state is compared to
    * the live replay; the result is the symmetric difference tagged by
    * side — empty ⇔ the backup is provably restorable. */
  def verifyRestore(spark: SparkSession, dir: String,
      liveEvents: DataFrame): DataFrame = {
    val restored = rebuildState(spark, dir)
    val live = EventStreams.userState(liveEvents)
    restored.exceptAll(live).withColumn("side", lit("backup_only"))
      .unionAll(live.exceptAll(restored).withColumn("side", lit("live_only")))
  }
}
