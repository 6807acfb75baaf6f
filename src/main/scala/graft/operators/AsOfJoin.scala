package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** As-of join — the classic operator Spark's built-ins lack, composed
  * from existing operators per the engine's preference order (compose >
  * custom plan): for each left row, the latest right row with the same
  * key and timestamp ≤ the left timestamp.
  *
  * Technique: tag both sides, union, and run one window per key ordered
  * by (ts, tag, id) carrying the last non-null right id forward
  * (`last_value ignore nulls`). Right rows sort before left rows at
  * equal timestamps, giving ≤ semantics with a deterministic id
  * tiebreak. One shuffle keyed by the join key; no range-join
  * explosion, no per-row binary search — at 100 TB this is the
  * merge-join-shaped plan you want, and the window is
  * partial-agg-friendly.
  */
object AsOfJoin {

  /** Generic form over pre-shaped frames:
    * left(key, ts, id), right(key, ts, id) → (id, key, ts, asof_id). */
  def asOf(left: DataFrame, right: DataFrame): DataFrame = {
    val tagged = right.select(col("key"), col("ts"), col("id"), lit(0).as("tag"))
      .unionAll(left.select(col("key"), col("ts"), col("id"), lit(1).as("tag")))
    val w = Window.partitionBy("key")
      .orderBy(col("ts"), col("tag"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_id",
        last(when(col("tag") === 0, col("id")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("id"), col("key"), col("ts"), col("asof_id"))
  }

  /** Corpus instance: for every purchase event, the user's latest click
    * at-or-before it, with the gap in microseconds. */
  def purchaseLastClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = EventStreams.events(spark, dir)
      .withColumn("us", expr("unix_micros(ts)"))
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id").as("key"), col("us").as("ts"), col("event_id").as("id"))
    val joined = asOf(side("purchase"), side("click"))
    val clickTs = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("asof_id"), col("us").as("click_us"))
    joined.join(clickTs, Seq("asof_id"), "left")
      .select(col("id").as("purchase_id"), col("key").as("user_id"),
        col("asof_id").as("last_click_id"),
        (col("ts") - col("click_us")).as("gap_us"))
  }
}
