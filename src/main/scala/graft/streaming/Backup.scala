package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Stores

/** Online-backup surface (SURVEY.md §3.3): full snapshot + incremental
  * change shipping by watermark, mirroring the reference's
  * BackupService (full: rotateLogsAndStreamStoreFiles,
  * ServerUtil.java:126-180; incremental: txs in (lastApplied, end],
  * ServerUtil.java:336-355; lifecycle TestBackup.java:220
  * fullThenIncremental).
  *
  * The backup location is a parquet directory per table plus a
  * `_watermark` file holding the last applied event id (the
  * RequestContext lastAppliedTransactions analog) and a `_store_id`
  * file naming the store the backup belongs to. Incremental ships only
  * rows with event_id > watermark and advances it — idempotent under
  * re-run (empty increment) — and REFUSES to touch a backup stamped
  * with a different store id: the reference enforces exactly this
  * (TestBackup.java:264 makeSureStoreIdIsEnforced) because an
  * incremental applied across stores silently corrupts the target.
  */
object Backup {
  private def watermarkPath(dir: String) = Paths.get(dir, "_watermark")
  private def storeIdPath(dir: String) = Paths.get(dir, "_store_id")

  /** store identity a lifecycle runs under when the caller has only one
    * store (the common single-database case) */
  val DefaultStoreId = "graft-default-store"

  def readWatermark(dir: String): Long = {
    val p = watermarkPath(dir)
    if (Files.exists(p)) Files.readString(p).trim.toLong else -1L
  }

  private def writeWatermark(dir: String, w: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(watermarkPath(dir), w.toString)
  }

  def readStoreId(dir: String): Option[String] = {
    val p = storeIdPath(dir)
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  private def writeStoreId(dir: String, id: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(storeIdPath(dir), id)
  }

  /** throws unless the backup at `dir` belongs to `storeId` — a backup
    * with no stamp (pre-guard layout) is accepted */
  private def enforceStoreId(dir: String, storeId: String, op: String): Unit =
    readStoreId(dir).foreach { stamped =>
      if (stamped != storeId)
        throw new IllegalStateException(
          s"$op refused: backup at $dir belongs to store '$stamped', not '$storeId'")
    }

  /** S5: full snapshot of the event log up to its current max id,
    * stamped with the source store's id. */
  def full(spark: SparkSession, ev: DataFrame, dir: String,
           storeId: String = DefaultStoreId): Long = {
    val w = ev.agg(coalesce(max("event_id"), lit(-1L))).head().getLong(0)
    ev.write.mode("overwrite").parquet(s"$dir/events")
    writeWatermark(dir, w)
    writeStoreId(dir, storeId)
    w
  }

  /** S6/S7: append only the rows beyond the stored watermark, advance
    * it. Returns the number of rows shipped. Refuses a backup stamped
    * for a different store. */
  def incremental(spark: SparkSession, ev: DataFrame, dir: String,
                  storeId: String = DefaultStoreId): Long = {
    enforceStoreId(dir, storeId, "incremental")
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
    * (RebuildFromLogs.java:60-150 — replay then verify). Refuses a
    * backup stamped for a different store. */
  def rebuildState(spark: SparkSession, dir: String,
                   storeId: String = DefaultStoreId): DataFrame = {
    enforceStoreId(dir, storeId, "rebuildState")
    EventStreams.userState(
      spark.read.parquet(s"$dir/events")
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)")))
  }

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

  // ---- record-store backup (the graph store itself) -------------------

  private val storeNames = Seq("nodes", "rels", "neo", "props", "blocks",
    "dyns", "arrays", "rel_types", "prop_keys", "type_names", "key_names")

  /** S5 proper: the reference's full backup streams ALL store files —
    * node, relationship, property, dynamic, dictionary stores — not
    * just the log (ServerUtil.rotateLogsAndStreamStoreFiles,
    * com/.../ServerUtil.java:126-180; BackupService.java:85-135).
    * Snapshot every store of the bundle as parquet, stamped with the
    * store id. Each store writes partition-parallel; nothing funnels
    * through the driver. */
  def fullStores(s: Stores, dir: String,
                 storeId: String = DefaultStoreId): Unit = {
    val all = Seq(s.nodes, s.rels, s.neo, s.props, s.blocks, s.dyns,
      s.arrays, s.relTypes, s.propKeys, s.typeNames, s.keyNames)
    storeNames.zip(all).foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n")
    }
    writeStoreId(dir, storeId)
  }

  /** Restore the snapshot into a fresh [[Stores]] bundle — the copy a
    * consistency check then proves trustworthy
    * (BackupService.java:99-102: a backup is verified by running the
    * full check over the restored copy). */
  def restoreStores(spark: SparkSession, dir: String,
                    storeId: String = DefaultStoreId): Stores = {
    enforceStoreId(dir, storeId, "restoreStores")
    def rd(n: String) = spark.read.parquet(s"$dir/$n")
    Stores(rd("nodes"), rd("rels"), rd("neo"), rd("props"), rd("blocks"),
      rd("dyns"), rd("arrays"), rd("rel_types"), rd("prop_keys"),
      rd("type_names"), rd("key_names"))
  }
}
