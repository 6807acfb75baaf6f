package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Event-time watermark semantics: in append mode a window is emitted
  * once the watermark passes its end, and data later than the
  * watermark is dropped — the late-data contract of the streaming
  * surface (absent from the reference, mandated by the north-star
  * extension). */
class WatermarkSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode hourly agg finalizes on watermark and drops late rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val src = stream.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyAggStream(src)
      .writeStream.format("memory").queryName("wm_agg")
      .outputMode("append")
      .start()
    try {
      // batch 1: two rows in the 10:00 window, one at 13:00 that moves
      // the watermark to 11:00 (2h behind max event time)
      stream.addData(
        (ts("2024-01-01 10:00:00"), "click", 1.0),
        (ts("2024-01-01 10:30:00"), "click", 1.0),
        (ts("2024-01-01 13:00:00"), "click", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE row for the already-finalized 10:00 window
      stream.addData((ts("2024-01-01 09:59:00"), "click", 1.0))
      q.processAllAvailable()
      // batch 3: advance far enough to flush everything else
      stream.addData((ts("2024-01-01 20:00:00"), "click", 1.0))
      q.processAllAvailable()

      val rows = spark.table("wm_agg").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
      // the 10:00 window closed with 2 rows; the late 09:59 row was
      // dropped, not merged and not re-emitted
      assert(rows("2024-01-01 10:00:00.0") === 2L)
      assert(!rows.contains("2024-01-01 09:00:00.0"))
    } finally q.stop()
  }

  test("streaming dedup emits re-delivered events exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val src = stream.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStreams.dedupStream(src)
      .writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append")
      .start()
    try {
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), "click"),
        (2L, ts("2024-01-01 10:01:00"), "click"))
      q.processAllAvailable()
      // re-delivery of id 1 (same payload, later batch) + a new event
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), "click"),
        (3L, ts("2024-01-01 10:02:00"), "purchase"))
      q.processAllAvailable()
      val ids = spark.table("wm_dedup").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming sessionization (flatMapGroupsWithState) equals the batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val src = stream.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionizeStream(src)
      .writeStream.format("memory").queryName("wm_sess")
      .outputMode("append")
      .start()
    try {
      // user 1: two sessions (10:00-10:10, then 12:00 after a 110-min
      // gap); user 2: one session. The sentinel user 99 only advances
      // the watermark so every real session times out and emits.
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:10:00"), 2.0),
        (2L, ts("2024-01-01 10:05:00"), 5.0))
      q.processAllAvailable()
      stream.addData((1L, ts("2024-01-01 12:00:00"), 3.0))
      q.processAllAvailable()
      stream.addData((99L, ts("2024-01-02 23:00:00"), 0.0))
      q.processAllAvailable()
      stream.addData((99L, ts("2024-01-03 23:00:00"), 0.0))
      q.processAllAvailable()

      val streamed = spark.table("wm_sess")
        .filter("user_id < 99")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
          r.getLong(3), r.getLong(4))).toSet

      import spark.implicits._
      val batchRows = Seq(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:10:00"), 2.0),
        (2L, ts("2024-01-01 10:05:00"), 5.0),
        (1L, ts("2024-01-01 12:00:00"), 3.0))
        .toDF("user_id", "ts", "value")
        .withColumn("event_id", org.apache.spark.sql.functions.expr("CAST(0 AS BIGINT)"))
        .withColumn("cents", org.apache.spark.sql.functions.expr(
          "CAST(round(value * 100) AS BIGINT)"))
      val batch = EventStreams.sessionize(batchRows)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
          r.getLong(3), r.getLong(4))).toSet
      assert(streamed === batch)
      assert(streamed.size === 3)
    } finally q.stop()
  }

  test("streaming transitions equal the batch transition matrix across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    val src = stream.toDF().toDF("user_id", "ts", "event_id", "event_type")
    val q = EventStreams.transitionsStream(src)
      .writeStream.format("memory").queryName("wm_trans")
      .outputMode("append")
      .start()
    val rows = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (10L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (20L, ts("2024-01-01 10:02:00"), 3L, "view"))
    val rows2 = Seq( // second batch continues both users via state
      (10L, ts("2024-01-01 10:03:00"), 4L, "purchase"),
      (20L, ts("2024-01-01 10:04:00"), 5L, "error"))
    try {
      stream.addData(rows: _*); q.processAllAvailable()
      stream.addData(rows2: _*); q.processAllAvailable()
      val streamed = spark.table("wm_trans")
        .groupBy("from_type", "to_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      import spark.implicits._
      val batch = EventStreams.transitions(
        (rows ++ rows2).toDF("user_id", "ts", "event_id", "event_type"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
      assert(streamed(("view", "click")) === 1L)
      assert(streamed(("click", "purchase")) === 1L) // bridged across batches
    } finally q.stop()
  }

  test("transitions state expires for idle users after the event-time gap; active users keep bridging") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    val src = stream.toDF().toDF("user_id", "ts", "event_id", "event_type")
    val q = EventStreams.transitionsStream(src, idleGapMs = 3600000L) // 1h gap
      .writeStream.format("memory").queryName("wm_trans_idle")
      .outputMode("append")
      .start()
    try {
      // b1: both users seen at 10:00; timeouts armed at 11:00
      stream.addData(
        (10L, ts("2024-01-01 10:00:00"), 1L, "view"),
        (20L, ts("2024-01-01 10:00:00"), 2L, "view"))
      q.processAllAvailable()
      // b2: only u20 stays active (watermark 08:00 — nobody expires)
      stream.addData((20L, ts("2024-01-01 20:00:00"), 3L, "click"))
      q.processAllAvailable()
      // b3: watermark reaches 18:00 > u10's 11:00 timeout — u10's
      // state is removed; u20 keeps bridging
      stream.addData((20L, ts("2024-01-01 23:00:00"), 4L, "purchase"))
      q.processAllAvailable()
      // b4: u10 returns after a 13.5h idle gap — treated as FRESH (no
      // bridge from the 10:00 view); u20 (active) still bridges
      stream.addData(
        (10L, ts("2024-01-01 23:30:00"), 5L, "click"),
        (20L, ts("2024-01-01 23:30:00"), 6L, "error"))
      q.processAllAvailable()
      val got = spark.table("wm_trans_idle")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === Set(
        (20L, "view", "click"),
        (20L, "click", "purchase"),
        (20L, "purchase", "error")))
      // the batch twin WOULD bridge u10's cross-gap pair — the
      // documented trade for bounded aggregate state
      assert(!got.exists(_._1 == 10L))
    } finally q.stop()
  }

  test("stateful stream recovers keyed state from a checkpoint across restart") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_out").toString
    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    // the memory sink cannot recover from a checkpoint — a real file
    // sink is the production shape anyway
    def start() = EventStreams.transitionsStream(
        stream.toDF().toDF("user_id", "ts", "event_id", "event_type"))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    val q1 = start()
    try {
      stream.addData((10L, ts("2024-01-01 10:00:00"), 1L, "view"))
      q1.processAllAvailable()
    } finally q1.stop()
    // cold restart: a NEW query instance on the same checkpoint must
    // resume with user 10's last event in state — the exactly-once
    // recovery contract a driver crash exercises in production
    val q2 = start()
    try {
      stream.addData((10L, ts("2024-01-01 10:05:00"), 2L, "purchase"))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir)
        .select("from_type", "to_type")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows.contains(("view", "purchase"))) // bridged across restart
    } finally q2.stop()
  }
}
