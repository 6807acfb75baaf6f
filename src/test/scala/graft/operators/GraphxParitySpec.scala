package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.graphx.lib.ShortestPaths
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.TpchGraph

/** Cross-engine parity: the DataFrame-first iterative operators
  * ([[Iterative.iterateMin]]) must agree with GraphX's own
  * implementations at convergence — two independently-built engines
  * (Pregel over RDDs vs Catalyst-planned joins) reaching the same
  * fixpoint is the strongest semantic check available without an
  * external oracle. Run at sf0.001 where the fixpoint is reached well
  * inside the iteration budget. */
class GraphxParitySpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val ConvergeIters = 12 // > graph diameter at sf0.001

  test("connected components equal GraphX connectedComponents at convergence") {
    val rels = TpchGraph.relsLite(spark, dir).filter(col("type") === "HAS_PART")
    // ours: min-propagation until fixpoint
    val edges = rels.select(col("src"), col("dst"))
      .unionAll(rels.select(col("dst").as("src"), col("src").as("dst")))
    val vertices = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val ours = Iterative.iterateMin(vertices, edges, ConvergeIters, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // GraphX: undirected CC over the same edge set
    val gxEdges = rels.select("src", "dst").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val gx = Graph.fromEdges(gxEdges, ()).connectedComponents()
      .vertices.collect().toMap

    assert(ours.size === gx.size)
    assert(ours === gx.map { case (k, v) => (k: Long) -> (v: Long) })
  }

  test("BFS depths equal GraphX ShortestPaths from the region landmarks") {
    val g = TpchGraph(spark, dir)
    val rels = TpchGraph.relsLite(spark, dir)
    val edges = rels.select(col("src"), col("dst"))
      .unionAll(rels.select(col("dst").as("src"), col("src").as("dst")))
    val vertices = g.nodes.select(col("id").as("node"),
      when(col("kind") === "region", 0L).otherwise(Iterative.Unreachable).as("label"))
    val seeds = vertices.filter(col("label") === 0L)
    val ours = Iterative
      .iterateMin(vertices, edges, ConvergeIters, 1L, frontier0 = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val landmarks = g.nodes.filter(col("kind") === "region")
      .select("id").collect().map(_.getLong(0)).toSeq
    val gxEdges = rels.select("src", "dst").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    // ShortestPaths follows edge direction; feed both directions for the
    // undirected semantics our BFS uses
    val sym = gxEdges.union(gxEdges.map(e => Edge(e.dstId, e.srcId, ())))
    val allIds = g.nodes.select("id").rdd.map(r => (r.getLong(0), ()))
    val gx = Graph(allIds, sym).mapVertices((_, _) => ())
    val depths = ShortestPaths.run(gx, landmarks).vertices.collect().toMap
      .map { case (vid, m) =>
        (vid: Long) -> (if (m.isEmpty) Iterative.Unreachable else m.values.min.toLong)
      }

    assert(ours.size === depths.size)
    assert(ours === depths)
  }
}
