package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Salted two-phase aggregation must be exactly the direct groupBy on
  * skewed data, and actually spread the hot key across salt buckets. */
class SaltSpec extends SparkTestBase {
  import spark.implicits._

  test("salted sum equals direct sum under 90% single-key skew") {
    val skewed = spark.range(100000).select(
      when(col("id") % 10 =!= 0, lit("HOT")).otherwise(concat(lit("k"), col("id") % 7)).as("k"),
      (col("id") * 3 + 1).as("v"))
    val direct = skewed.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salt.saltedSum(skewed, "k", "v", buckets = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }

  test("salted sum is exact for a hot key with a CONSTANT value") {
    // the canonical skew case that defeats content-derived salts: every
    // hot row carries the same value, so hash(value) lands them all in
    // one bucket — the row-local salt must still be exact here
    val skewed = spark.range(50000).select(
      lit("HOT").as("k"), lit(7L).as("v"))
    val salted = Salt.saltedSum(skewed, "k", "v", buckets = 16).head()
    assert(salted.getString(0) === "HOT")
    assert(salted.getLong(1) === 7L * 50000)
  }

  test("the hot key occupies multiple salt buckets in phase one") {
    // row-local salt: constant-value rows still spread across buckets
    val skewed = spark.range(10000).select(
      lit("HOT").as("k"), lit(7L).as("v"))
    val phase1 = skewed
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(16)))
      .groupBy("k", "_salt").count()
    assert(phase1.count() > 8) // spread, not one reducer group
  }
}
