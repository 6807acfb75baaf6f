package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** corenessOf on hand graphs with known decompositions. */
class CorenessSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** symmetrized edge DF from undirected pairs */
  private def edges(pairs: (Long, Long)*) = {
    val rows = pairs.flatMap { case (a, b) => Seq(Row(a, b), Row(b, a)) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Iterative.corenessOf(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a tail: triangle is 2-core, tail is 1-core") {
    val cor = run(edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(cor === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("K4 plus pendant: clique coreness 3, pendant 1") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val cor = run(edges(k4 :+ ((4L, 5L)): _*))
    assert(cor === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L))
  }

  test("path graph is entirely 1-core") {
    val cor = run(edges((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(cor.values.toSet === Set(1L))
  }

  test("9-node path: center reaching deg 0 in the level's last round is 1-core") {
    // With KcoreIters = 4, the k=2 peel removes 4 nodes from each end and
    // the center's degree hits exactly 0 in the final (non-converged)
    // round. The oracle's distinct-src-of-final-edge-set semantics give
    // it coreness 1, not 2 — the level-boundary zero sweep pins this.
    assume(Iterative.KcoreIters == 4)
    val cor = run(edges(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L)))
    assert(cor.values.toSet === Set(1L))
  }
}
