package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IterativeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("cc labels are fixpoint-consistent: every edge joins same-label nodes") {
    val cc = Iterative.connectedComponents(spark, dir)
    val rels = graft.model.TpchGraph.rels(spark, dir)
      .filter(col("type") === "HAS_PART")
    // after convergence, an edge with different labels would mean the
    // bounded iteration stopped early — assert none (diameter small)
    val crossing = rels
      .join(cc.select(col("node").as("src"), col("label").as("la")), "src")
      .join(cc.select(col("node").as("dst"), col("label").as("lb")), "dst")
      .filter(col("la") =!= col("lb"))
    assert(crossing.count() === 0L)
    // label is a member of its own component (min id)
    assert(cc.filter(col("label") > col("node")).count() === 0L)
  }

  test("converged cc labels are a true fixpoint: zero crossing edges, canonical labels") {
    val cc = Iterative.ccLabelsConverged(spark, dir)
    val rels = graft.model.TpchGraph.rels(spark, dir)
      .filter(col("type") === "HAS_PART")
    val crossing = rels
      .join(cc.select(col("node").as("src"), col("label").as("la")), "src")
      .join(cc.select(col("node").as("dst"), col("label").as("lb")), "dst")
      .filter(col("la") =!= col("lb"))
    assert(crossing.count() === 0L)
    assert(cc.filter(col("label") > col("node")).count() === 0L)
    // and every label is itself a member node (canonical min-id)
    val labels = cc.select(col("label")).distinct()
    assert(labels.join(cc.select(col("node").as("label")), Seq("label"), "left_anti")
      .count() === 0L)
  }

  test("bfs depths from regions: nations at 1, customers/suppliers at 2, orders 3, parts 4") {
    val depths = Iterative.bfsDepth(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(depths(0L) === 5L)   // regions
    assert(depths(1L) === 25L)  // nations
    assert(depths.contains(2L) && depths.contains(3L) && depths.contains(4L))
    assert(!depths.contains(Iterative.Unreachable)) // everything connected
  }
}
