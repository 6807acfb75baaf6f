package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Fixture SCCs for [[Scc.sccOf]] — each graph's components are known
  * by inspection, and the FW-BW-Trim result must label every node with
  * the MIN member id of its strongly-connected component. */
class SccSpec extends SparkTestBase {

  private def edgesDf(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  /** every fixture runs BOTH paths: the default sequential-cutoff tail
    * solve (hand graphs are under the cutoff) and, with the cutoff
    * forced to 0, the fully distributed trim+color+settle pipeline —
    * the two must agree exactly. */
  private def run(es: Seq[(Long, Long)]): Map[Long, Long] = {
    def result() = Scc.sccOf(edgesDf(es)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("scc_id")).toMap
    val local = result()
    spark.conf.set(Scc.LocalNodeCutoffKey, "0")
    try {
      val distributed = result()
      assert(distributed === local,
        "distributed color/settle path disagrees with the Tarjan tail solve")
    } finally spark.conf.unset(Scc.LocalNodeCutoffKey)
    local
  }

  test("empty edge set returns a typed empty frame, not null") {
    val out = Scc.sccOf(edgesDf(Seq.empty))
    assert(out.columns.toSeq === Seq("node", "scc_id"))
    assert(out.count() === 0L)
  }

  test("large random tournament-ish graph matches a reference Tarjan run via cutoff equivalence") {
    // deterministic pseudo-random digraph: mixed cycles + DAG tails
    val rnd = new scala.util.Random(42)
    val es = (0 until 400).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    }.distinct.filter { case (a, b) => a != b }
    run(es) // the assert inside run() is the check: both paths agree
  }

  test("3-cycle with a tail: cycle is one SCC, tail nodes are singletons") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  test("pure DAG: every node is its own SCC") {
    val got = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("two cycles joined by a one-way bridge stay separate SCCs") {
    val got = run(Seq(
      (1L, 2L), (2L, 1L), // SCC {1,2}
      (2L, 10L), // bridge, one-way
      (10L, 11L), (11L, 12L), (12L, 10L))) // SCC {10,11,12}
    assert(got === Map(1L -> 1L, 2L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("self-loop is a singleton SCC that survives the trim") {
    val got = run(Seq((7L, 7L), (7L, 8L)))
    assert(got === Map(7L -> 7L, 8L -> 8L))
  }

  test("nested: big cycle containing a chord forms one SCC") {
    // 1→2→3→4→1 with chord 3→1: still exactly one SCC {1,2,3,4}
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (3L, 1L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}
