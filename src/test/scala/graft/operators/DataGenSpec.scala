package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Generator invariants mirroring the reference's DataGeneratorTest:
  * spec-count math, value shapes, and determinism independent of
  * partitioning (the property rand(seed) cannot give). */
class DataGenSpec extends SparkTestBase {

  test("relCount = nodeCount × Σspec (DataGenerator.java:96-102)") {
    val r = DataGen.rels(spark, 1000L, "FOO:2,BAR:1")
    assert(r.count() === 3000L)
    val byType = r.groupBy("type").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byType === Map("FOO" -> 2000L, "BAR" -> 1000L))
  }

  test("value shapes: INTEGER in [0,16), STRING length 50-120, BYTE_ARRAY 50 ints in [0,256)") {
    val n = DataGen.nodes(spark, 500L, "INTEGER:1,STRING:1,BYTE_ARRAY:1,SINGLE_STRING:1")
    val bad = n.filter(
      col("integer_0_0") < 0 || col("integer_0_0") >= 16 ||
      length(col("string_1_0")) < 50 || length(col("string_1_0")) > 120 ||
      size(col("byte_array_2_0")) =!= 50 ||
      expr("exists(byte_array_2_0, b -> b < 0 OR b >= 256)") ||
      col("single_string_3_0") =!= "SINGLE")
    assert(bad.count() === 0L)
    // values actually vary
    assert(n.select(countDistinct("integer_0_0")).head().getLong(0) === 16L)
    assert(n.select(countDistinct("string_1_0")).head().getLong(0) > 400L)
  }

  test("generation is partitioning-invariant (deterministic at any layout)") {
    val a = DataGen.nodes(spark, 2000L, "INTEGER:2,STRING:1")
      .orderBy("id").collect().map(_.toSeq)
    val b = DataGen.nodes(spark, 2000L, "INTEGER:2,STRING:1")
      .repartition(17).orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("rel targets are roughly uniform") {
    val r = DataGen.rels(spark, 5000L, "FOO:2")
    val distinct = r.select(countDistinct("dst")).head().getLong(0)
    // 10000 draws over 5000 targets: expect ~4300 distinct (coupon-ish)
    assert(distinct > 3500L && distinct <= 5000L)
  }
}
