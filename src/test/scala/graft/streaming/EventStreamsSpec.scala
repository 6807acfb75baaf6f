package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Structured-Streaming execution tests: the streaming forms must
  * produce exactly the batch twins' results when fed the same log as
  * micro-batches (the reference's incremental == full equivalence,
  * FullDiffCheck vs IncrementalDiffCheck). */
class EventStreamsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** events split into 3 id-ranged parquet files in a temp dir — a
    * file-source stream with one file per micro-batch. */
  private def stagedStreamDir(): String = {
    val ev = EventStreams.events(spark, dir)
    val out = Files.createTempDirectory("graft-stream").toString
    val maxId = ev.agg(max("event_id")).head().getLong(0)
    val cut1 = maxId / 3; val cut2 = 2 * maxId / 3
    Seq(
      ev.filter(col("event_id") <= cut1),
      ev.filter(col("event_id") > cut1 && col("event_id") <= cut2),
      ev.filter(col("event_id") > cut2)
    ).zipWithIndex.foreach { case (part, i) =>
      part.coalesce(1).write.mode("overwrite").parquet(s"$out/batch$i")
      // move the part file up so the dir is a flat file-source input
      val f = Files.list(java.nio.file.Paths.get(s"$out/batch$i")).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.move(f, java.nio.file.Paths.get(s"$out/part$i.parquet"))
    }
    out
  }

  private def asRows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("foreachBatch MERGE over micro-batches equals batch replay (S7)") {
    val staged = stagedStreamDir()
    val ev = EventStreams.events(spark, dir)
    val schema = spark.read.parquet(s"$staged/part0.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$staged/part*.parquet")

    var state: Option[DataFrame] = None
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bState = EventStreams.userState(batch)
        // materialize: foreachBatch DataFrames are only valid in-batch
        val persisted = spark.createDataFrame(bState.collect().toList.asJava, bState.schema)
        state = Some(state.fold(persisted)(s => EventStreams.mergeStates(s, persisted)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    assert(asRows(state.get) === asRows(EventStreams.userState(ev)))
  }

  test("watermarked streaming hourly agg equals batch twin") {
    val staged = stagedStreamDir()
    val schema = spark.read.parquet(s"$staged/part0.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$staged/part*.parquet")
    val q = EventStreams.hourlyAggStream(src)
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly_stream")
    val batch = EventStreams.hourlyAgg(EventStreams.events(spark, dir))
    assert(asRows(streamed) === asRows(batch))
  }

  test("stream-stream interval join pairs equal the batch twin's inner pairs") {
    val staged = stagedStreamDir()
    val schema = spark.read.parquet(s"$staged/part0.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$staged/part*.parquet")
    val q = EventStreams.purchaseClicksStream(src)
      .writeStream.format("memory").queryName("ival_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = asRows(spark.table("ival_stream"))
    // batch inner pairs: re-derive from the same corpus
    val ev = EventStreams.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        expr("unix_micros(ts)").as("pus"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        expr("unix_micros(ts)").as("cus"))
    val batch = asRows(p.join(c, col("user_id") === col("cu") &&
        col("cus") >= col("pus") - EventStreams.JoinWindowMicros &&
        col("cus") <= col("pus"))
      .select(col("purchase_id"), col("user_id"), col("click_id")))
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("mapGroupsWithState running totals equal the batch aggregate") {
    import spark.implicits._
    val ev = EventStreams.events(spark, dir)
    val rows = ev.select(col("event_id"), col("user_id"), col("cents"))
      .as[EventStreams.EvRow]
    val totals = EventStreams.runningTotals(rows).collect().toMap
    val expected = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("t"), max("event_id").as("l"))
      .collect().map(r => r.getLong(0) ->
        EventStreams.UserAgg(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(totals === expected)
  }

  test("full-then-incremental backup rebuilds the exact replay state (TestBackup lifecycle)") {
    val backupDir = Files.createTempDirectory("graft-backup").toString
    val ev = EventStreams.events(spark, dir)
    val maxId = ev.agg(max("event_id")).head().getLong(0)
    val w = maxId / 2
    // full backup of the first half, then the rest arrives and ships
    Backup.full(spark, ev.filter(col("event_id") <= w), backupDir)
    assert(Backup.readWatermark(backupDir) === w)
    val shipped = Backup.incremental(spark, ev, backupDir)
    assert(shipped === ev.filter(col("event_id") > w).count())
    assert(Backup.readWatermark(backupDir) === maxId)
    // idempotent re-run ships nothing
    assert(Backup.incremental(spark, ev, backupDir) === 0L)
    // rebuild == direct replay
    assert(asRows(Backup.rebuildState(spark, backupDir)) ===
      asRows(EventStreams.userState(ev)))
  }

  test("store id is enforced: wrong-store incremental/rebuild refuse, right store succeeds (TestBackup.makeSureStoreIdIsEnforced)") {
    val backupDir = Files.createTempDirectory("graft-backup-sid").toString
    val ev = EventStreams.events(spark, dir)
    val w = ev.agg(max("event_id")).head().getLong(0) / 2
    Backup.full(spark, ev.filter(col("event_id") <= w), backupDir, storeId = "store-A")
    assert(Backup.readStoreId(backupDir) === Some("store-A"))
    // an incremental from a DIFFERENT store must refuse, leaving the
    // backup untouched (watermark unchanged)
    intercept[IllegalStateException] {
      Backup.incremental(spark, ev, backupDir, storeId = "store-B")
    }
    assert(Backup.readWatermark(backupDir) === w)
    intercept[IllegalStateException] {
      Backup.rebuildState(spark, backupDir, storeId = "store-B")
    }
    // the right store proceeds normally
    assert(Backup.incremental(spark, ev, backupDir, storeId = "store-A") ===
      ev.filter(col("event_id") > w).count())
    assert(asRows(Backup.rebuildState(spark, backupDir, storeId = "store-A")) ===
      asRows(EventStreams.userState(ev)))
  }

  test("multiple incrementals advance the watermark each time; rebuild equals direct replay (TestBackup.multipleIncrementals)") {
    val backupDir = Files.createTempDirectory("graft-backup-multi").toString
    val ev = EventStreams.events(spark, dir)
    val maxId = ev.agg(max("event_id")).head().getLong(0)
    val cuts = Seq(maxId / 4, maxId / 2, 3 * maxId / 4, maxId)
    Backup.full(spark, ev.filter(col("event_id") <= cuts.head), backupDir)
    // three increments, each shipping exactly its slice of the log
    cuts.sliding(2).foreach { case Seq(lo, hi) =>
      val shipped = Backup.incremental(
        spark, ev.filter(col("event_id") <= hi), backupDir)
      assert(shipped ===
        ev.filter(col("event_id") > lo && col("event_id") <= hi).count())
      assert(Backup.readWatermark(backupDir) === hi)
    }
    assert(asRows(Backup.rebuildState(spark, backupDir)) ===
      asRows(EventStreams.userState(ev)))
  }

  test("record-store backup restores every store byte-identically (S5 fullStores)") {
    import graft.checker.Corruption
    import graft.model.RecordStores
    val backupDir = Files.createTempDirectory("graft-backup-stores").toString
    val live = Corruption(RecordStores.deriveCached(spark, dir))
    Backup.fullStores(live, backupDir, storeId = "store-A")
    intercept[IllegalStateException] {
      Backup.restoreStores(spark, backupDir, storeId = "store-B")
    }
    val restored = Backup.restoreStores(spark, backupDir, storeId = "store-A")
    // multiset equality per store (order-free, like the reference's
    // whole-graph deep-equality oracle)
    for ((l, r) <- Seq(live.nodes -> restored.nodes, live.rels -> restored.rels,
        live.props -> restored.props, live.blocks -> restored.blocks,
        live.dyns -> restored.dyns, live.arrays -> restored.arrays,
        live.neo -> restored.neo)) {
      assert(l.exceptAll(r).count() === 0L)
      assert(r.exceptAll(l).count() === 0L)
    }
  }

  test("verify-after-restore passes on a faithful backup and catches a tampered one") {
    val backupDir = Files.createTempDirectory("graft-backup-verify").toString
    val ev = EventStreams.events(spark, dir)
    val w = ev.agg(max("event_id")).head().getLong(0) / 2
    Backup.full(spark, ev.filter(col("event_id") <= w), backupDir)
    Backup.incremental(spark, ev, backupDir)
    // faithful backup: symmetric difference is empty
    assert(Backup.verifyRestore(spark, backupDir, ev).count() === 0L)
    // tamper: rewrite the backup with one event dropped — the verify
    // must flag both sides' diverging user rows
    val tampered = spark.read.parquet(s"$backupDir/events")
      .orderBy(col("event_id")).limit(1).collect()(0).getAs[Long]("event_id")
    val kept = spark.read.parquet(s"$backupDir/events")
      .filter(col("event_id") =!= tampered).localCheckpoint(true)
    kept.write.mode("overwrite").parquet(s"$backupDir/events")
    val diff = Backup.verifyRestore(spark, backupDir, ev)
    assert(diff.filter(col("side") === "live_only").count() > 0)
  }

  test("backup concurrent with writes: txs landing during the copy are replayed by the next incremental (backup.asciidoc:10-14)") {
    val backupDir = Files.createTempDirectory("graft-backup-race").toString
    val liveDir = Files.createTempDirectory("graft-live-race").toString
    val ev = EventStreams.events(spark, dir)
    val w = ev.agg(max("event_id")).head().getLong(0) / 2
    // the store as the copy starts: first half of the log on disk
    ev.filter(col("event_id") <= w).write.parquet(s"$liveDir/events")
    Backup.full(spark, spark.read.parquet(s"$liveDir/events"), backupDir)
    // writes land while/after the copy runs — the snapshot doesn't
    // hold locks, so the live store moves on (reference: backup
    // without locks; txs during the copy are replayed after)
    ev.filter(col("event_id") > w).write.mode("append")
      .parquet(s"$liveDir/events")
    val liveNow = spark.read.parquet(s"$liveDir/events")
    val shipped = Backup.incremental(spark, liveNow, backupDir)
    assert(shipped === ev.filter(col("event_id") > w).count())
    // nothing was lost to the race: restored replay == live replay
    assert(Backup.verifyRestore(spark, backupDir, liveNow).count() === 0L)
  }

  test("torn backup is refused; an intact one still restores (ConsistencyCheckTool refusal analog)") {
    val backupDir = Files.createTempDirectory("graft-backup-torn").toString
    val ev = EventStreams.events(spark, dir)
    val maxId = ev.agg(max("event_id")).head().getLong(0)
    Backup.full(spark, ev, backupDir)
    // intact backup restores fine
    assert(asRows(Backup.rebuildState(spark, backupDir)) ===
      asRows(EventStreams.userState(ev)))
    // (a) watermark ahead of the data files: the copy died after the
    // stamp, or data files were lost — must refuse, not silently
    // restore a short log
    val wmPath = java.nio.file.Paths.get(backupDir, "_watermark")
    Files.writeString(wmPath, (maxId + 10).toString)
    intercept[IllegalStateException] { Backup.rebuildState(spark, backupDir) }
    intercept[IllegalStateException] {
      Backup.verifyRestore(spark, backupDir, ev)
    }
    Files.writeString(wmPath, maxId.toString) // heal → works again
    assert(Backup.rebuildState(spark, backupDir).count() > 0)
    // (b) data with no watermark stamp: torn before the stamp landed
    Files.delete(wmPath)
    intercept[IllegalStateException] { Backup.rebuildState(spark, backupDir) }
  }

  test("torn record-store backup (missing store file) is refused") {
    import graft.checker.Corruption
    import graft.model.RecordStores
    val backupDir = Files.createTempDirectory("graft-backup-torn-stores").toString
    val live = Corruption(RecordStores.deriveCached(spark, dir))
    Backup.fullStores(live, backupDir, storeId = "store-A")
    // delete one store directory — a copy that died mid-stream
    val propsDir = java.nio.file.Paths.get(backupDir, "props")
    Files.walk(propsDir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    val e = intercept[IllegalStateException] {
      Backup.restoreStores(spark, backupDir, storeId = "store-A")
    }
    assert(e.getMessage.contains("props"))
  }

  test("backup compaction consolidates files, preserves stamps, still restores and catches branches") {
    val backupDir = Files.createTempDirectory("graft-backup-compact").toString
    val ev = EventStreams.events(spark, dir)
    val maxId = ev.agg(max("event_id")).head().getLong(0)
    Backup.full(spark, ev.filter(col("event_id") <= maxId / 3), backupDir)
    Backup.incremental(spark, ev.filter(col("event_id") <= 2 * maxId / 3), backupDir)
    Backup.incremental(spark, ev, backupDir)
    def parquetFiles() = java.nio.file.Files
      .walk(java.nio.file.Paths.get(backupDir, "events"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = parquetFiles()
    assert(before > 1L) // increments accumulated file sets
    val wmBefore = Backup.readWatermark(backupDir)
    val fpBefore = Backup.readFingerprint(backupDir)
    Backup.compact(spark, backupDir)
    assert(parquetFiles() === 1L)
    // stamps untouched, restore identical, idempotent incremental ok
    assert(Backup.readWatermark(backupDir) === wmBefore)
    assert(Backup.readFingerprint(backupDir) === fpBefore)
    assert(asRows(Backup.rebuildState(spark, backupDir)) ===
      asRows(EventStreams.userState(ev)))
    assert(Backup.incremental(spark, ev, backupDir) === 0L)
    // the branch guard survives compaction
    val branched = ev.withColumn("event_type",
      when(col("event_id") === 1L, lit("rewritten")).otherwise(col("event_type")))
    intercept[IllegalStateException] {
      Backup.incremental(spark, branched, backupDir)
    }
    ()
  }

  test("branched source is refused by incremental; faithful append still ships (BranchedDataException analog)") {
    val backupDir = Files.createTempDirectory("graft-backup-branch").toString
    val ev = EventStreams.events(spark, dir)
    val maxId = ev.agg(max("event_id")).head().getLong(0)
    val w = maxId / 2
    Backup.full(spark, ev.filter(col("event_id") <= w), backupDir)
    // branch: the source REWRITES an already-backed-up event (same id
    // range, different content — BranchDetectingTxVerifier's checksum
    // mismatch, not mere staleness)
    val branched = ev.withColumn("event_type",
      when(col("event_id") === 1L, lit("rewritten-history"))
        .otherwise(col("event_type")))
    val e = intercept[IllegalStateException] {
      Backup.incremental(spark, branched, backupDir)
    }
    assert(e.getMessage.contains("branched"))
    // backup untouched by the refusal
    assert(Backup.readWatermark(backupDir) === w)
    // the faithful source proceeds; the advanced fingerprint keeps
    // verifying on the NEXT incremental too
    assert(Backup.incremental(spark, ev, backupDir) ===
      ev.filter(col("event_id") > w).count())
    assert(Backup.incremental(spark, ev, backupDir) === 0L)
    assert(asRows(Backup.rebuildState(spark, backupDir)) ===
      asRows(EventStreams.userState(ev)))
  }

  test("per-store incremental backup ships each store's delta only; restored check violations unchanged (RequestContext per-datasource cursors)") {
    import graft.checker.{Corruption, FullCheck}
    import graft.model.RecordStores
    val backupDir = Files.createTempDirectory("graft-backup-incstores").toString
    val live = Corruption(RecordStores.deriveCached(spark, dir))
    // "earlier" snapshot: every store truncated to the lower half of
    // its own id space — the state the full backup saw before growth
    def half(df: DataFrame, idc: String): DataFrame = {
      val m = df.agg(max(col(idc))).head().getLong(0)
      df.filter(col(idc) <= m / 2)
    }
    val earlier = live.copy(
      nodes = half(live.nodes, "id"), rels = half(live.rels, "id"),
      props = half(live.props, "id"), blocks = half(live.blocks, "prop_id"),
      dyns = half(live.dyns, "id"), arrays = half(live.arrays, "id"))
    Backup.fullStores(earlier, backupDir)
    val marks = Backup.readStoreWatermarks(backupDir)
    assert(marks.keySet.size === 11)
    // incremental ships exactly the per-store deltas
    val shipped = Backup.incrementalStores(live, backupDir)
    assert(shipped("nodes") === live.nodes.count() - earlier.nodes.count())
    assert(shipped("rels") === live.rels.count() - earlier.rels.count())
    assert(shipped("props") === live.props.count() - earlier.props.count())
    assert(shipped("neo") === 0L) // unchanged store ships nothing
    // idempotent: a re-run ships zero rows everywhere
    assert(Backup.incrementalStores(live, backupDir).values.sum === 0L)
    // restored bundle is the live bundle, store by store
    val restored = Backup.restoreStores(spark, backupDir)
    for ((l, r) <- Seq(live.nodes -> restored.nodes, live.rels -> restored.rels,
        live.props -> restored.props, live.blocks -> restored.blocks,
        live.dyns -> restored.dyns, live.arrays -> restored.arrays)) {
      assert(l.exceptAll(r).count() === 0L)
      assert(r.exceptAll(l).count() === 0L)
    }
    // and the consistency check finds the SAME violations on the
    // restored copy — backup/restore neither hides nor invents any
    val lv = FullCheck.violations(live)
    val rv = FullCheck.violations(restored)
    assert(lv.exceptAll(rv).count() === 0L)
    assert(rv.exceptAll(lv).count() === 0L)
  }

  private implicit class ListOps[A](l: List[A]) {
    def asJava: java.util.List[A] = {
      val jl = new java.util.ArrayList[A](l.size)
      l.foreach(jl.add); jl
    }
  }
}
