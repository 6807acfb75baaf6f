package graft.checker

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Small-n invariants for the generated-workload record stores the
  * ScaleCheck 10M/30M/40M perf run assembles — the same shape the
  * reference's ConsistencyPerformanceCheck rides on (generate, then the
  * full check must come back clean). */
class ScaleCheckSpec extends SparkTestBase {

  test("freshly generated store checks violation-free with the expected store counts") {
    val n = 1000L
    val s = ScaleCheck.stores(spark, n)
    assert(FullCheck.violations(s).count() === 0L)
    assert(s.nodes.count() === n)
    assert(s.rels.count() === 3 * n)
    // one property record per node (4 props chunk into one 4-block
    // record) + the NeoStore chain's single record
    assert(s.props.count() === n + 1)
    assert(s.blocks.count() === 4 * n + 2)
    // byte arrays: 50 bytes → ceil(50/16) = 4 blocks each
    assert(s.arrays.count() === 4 * n)
    // string chains: ceil(len/16) blocks, len ∈ [50, 120]
    val expectedStringBlocks = graft.operators.DataGen
      .nodes(spark, n, ScaleCheck.NodePropSpec)
      .agg(sum(ceil(length(col("string_1_0")) / 16)).cast("long"))
      .head().getLong(0)
    assert(s.dyns.count() === expectedStringBlocks)
  }

  test("a corrupted generated store fires the shared checks") {
    val n = 500L
    val s = ScaleCheck.stores(spark, n)
    // point a node's property chain head at a non-existent record and
    // drop a relationship out of in_use mid-chain
    val badNodes = s.nodes.withColumn("next_prop",
      when(col("id") === 7L, lit(999999999L)).otherwise(col("next_prop")))
    val badRels = s.rels.withColumn("in_use",
      when(col("id") === n + 42L, lit(false)).otherwise(col("in_use")))
    val v = FullCheck.violations(s.copy(nodes = badNodes, rels = badRels))
      .groupBy("violation").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v.getOrElse("property_not_in_use", 0L) >= 1L)
    // the dropped rel leaves dangling chain pointers on its neighbors
    assert(v.keys.exists(_.endsWith("_not_in_use")))
  }
}
