package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** The new arbitrary-state API (transformWithState + RocksDB state
  * store): running totals equal the batch aggregate, and state
  * survives a checkpoint restart. */
class TransformWithStateSpec extends SparkTestBase {
  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("transformWithState totals == batch groupBy, across a restart") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", Provider)
    try {
      val stream = MemoryStream[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("graft_tws").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft_tws_out").toString
      def start() = EventStreams.runningTotalsTws(
          stream.toDF().toDF("user_id", "cents"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      stream.addData((1L, 100L), (1L, 50L), (2L, 30L))
      val q1 = start(); q1.awaitTermination()
      // cold restart on the same checkpoint: RocksDB state must resume
      stream.addData((1L, 7L), (3L, 1L))
      val q2 = start(); q2.awaitTermination()

      // last emitted row per user (max n_events is the latest state)
      val got = spark.read.parquet(outDir)
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("total_cents"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.total_cents"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === Map(
        1L -> ((3L, 157L)), // 100+50 then +7 across the restart
        2L -> ((1L, 30L)),
        3L -> ((1L, 1L))))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("VariantType JSON extraction agrees with get_json_object") {
    // Spark 4's semi-structured VariantType: parse once, then typed
    // extraction — the shredded-at-scan path JSON pipelines migrate
    // to. Must agree value-for-value with the string-path operator
    // s_props_json is built on.
    val ev = EventStreams.events(spark, "/root/testdata/sf0.001")
    val both = ev.selectExpr("event_id",
      "CAST(get_json_object(props, '$.k') AS BIGINT) AS via_string",
      "variant_get(parse_json(props), '$.k', 'bigint') AS via_variant")
    assert(both.filter(
      !(col("via_string") <=> col("via_variant"))).count() === 0L)
    assert(both.filter(col("via_variant").isNotNull).count() > 0L)
  }
}
