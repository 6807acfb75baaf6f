package graft.operators

import graft.SparkTestBase

/** k-truss peel curve invariants on the co-purchase graph. */
class KtrussSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private lazy val curve = GraphOps.ktruss(spark, dir).collect()
    .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_nodes")))
    .sortBy(_._1)

  test("one row per round, counts never negative") {
    assert(curve.map(_._1).toSeq === (0 to GraphOps.TrussIters))
    curve.foreach { case (_, e, n) => assert(e >= 0L && n >= 0L) }
    assert(curve.head._2 > 0L, "1995 co-purchase slice must have edges")
  }

  test("peel only shrinks: edges and nodes are non-increasing") {
    curve.sliding(2).foreach { case Array((_, e1, n1), (_, e2, n2)) =>
      assert(e2 <= e1, s"edges grew: $e1 -> $e2")
      assert(n2 <= n1, s"nodes grew: $n1 -> $n2")
    }
  }

  test("surviving edges imply a sane node count (2 endpoints max)") {
    curve.foreach { case (_, e, n) =>
      if (e == 0L) assert(n === 0L)
      else assert(n <= 2 * e && n >= 3,
        s"$n nodes for $e edges: a truss edge needs >= 3 nodes around it")
    }
  }

  test("clustering stats: bounded coefficients, counts consistent") {
    val r = GraphOps.clusteringStats(spark, dir).collect().head
    val (tri, wed) = (r.getAs[Long]("n_triangles"), r.getAs[Long]("n_wedges"))
    assert(wed >= 3 * tri, "every triangle contributes 3 closed wedges")
    val cc = r.getAs[Double]("global_cc")
    assert(cc >= 0.0 && cc <= 1.0)
    val ast = r.getAs[Double]("assortativity")
    assert(ast >= -1.0 && ast <= 1.0)
    // triangle count agrees with the standalone enumeration
    val t2 = GraphOps.triangleCount(spark, dir).collect().head
    assert(tri === t2.getAs[Long]("n_triangles"))
    assert(r.getAs[Long]("n_edges") === t2.getAs[Long]("n_edges"))
  }
}
