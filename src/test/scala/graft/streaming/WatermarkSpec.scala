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
}
