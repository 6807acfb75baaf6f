package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Borůvka MSF against hand-computed spanning forests (unique weights
  * make the MSF unique, so the edge set is fully determined). */
class MsfSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("w", LongType, nullable = false),
    StructField("wu", LongType, nullable = false)))

  /** edges with wu = w·1000 + a·10 + b (unique for these tiny ids) */
  private def edgesDf(es: Seq[(Long, Long, Long)]) =
    spark.createDataFrame(
      java.util.Arrays.asList(es.map { case (a, b, w) =>
        Row(a, b, w, w * 1000L + a * 10L + b)
      }: _*), schema)

  /** run BOTH paths — sequential tail (default cutoff) and forced
    * distributed rounds (cutoff 0) — assert full-row agreement
    * (round tag included), return the default path's rows */
  private def bothPaths(es: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Long)] = {
    def rows() = Msf.msfOf(spark, edgesDf(es)).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("src"),
        r.getAs[Long]("dst"), r.getAs[Long]("w"))).toSet
    spark.conf.unset(Msf.MsfLocalEdgeCutoffKey)
    val tail = rows()
    spark.conf.set(Msf.MsfLocalEdgeCutoffKey, "0")
    val dist = try rows() finally spark.conf.unset(Msf.MsfLocalEdgeCutoffKey)
    assert(tail === dist, "sequential tail vs distributed rounds")
    tail
  }

  private def runMsf(es: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    bothPaths(es).map(e => (e._2, e._3))

  test("triangle keeps the two light edges") {
    // 1-2 (w1), 2-3 (w2), 1-3 (w9): MST = {1-2, 2-3}
    val got = runMsf(Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 9L)))
    assert(got === Set((1L, 2L), (2L, 3L)))
  }

  test("two components stay a forest (no bridging edge invented)") {
    val got = runMsf(Seq(
      (1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 9L),
      (7L, 8L, 4L), (8L, 9L, 5L), (7L, 9L, 1L)))
    assert(got === Set((1L, 2L), (2L, 3L), (7L, 9L), (7L, 8L)))
  }

  test("increasing-weight path contracts along the chain (deep parent trees)") {
    // path 1-2-3-...-8 with increasing weights: every edge is in the
    // MST, and round-1 parent pointers form a chain that exercises the
    // pointer-doubling contraction
    val es = (1L to 7L).map(i => (i, i + 1L, i))
    val got = runMsf(es)
    assert(got === es.map(e => (e._1, e._2)).toSet)
  }

  test("MSF edge count is V - #components and total weight matches Kruskal") {
    // random-ish fixed graph, verify against an in-memory Kruskal
    val es = Seq(
      (1L, 2L, 4L), (1L, 3L, 3L), (2L, 3L, 2L), (2L, 4L, 7L),
      (3L, 4L, 1L), (3L, 5L, 8L), (4L, 5L, 6L), (4L, 6L, 5L),
      (5L, 6L, 9L), (6L, 7L, 2L), (5L, 7L, 3L), (1L, 7L, 9L))
    val msf = bothPaths(es).toSeq.map(e => (e._2, e._3, e._4))
    // Kruskal with the same (w, a, b) order
    val parent = scala.collection.mutable.Map((1L to 7L).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    val kruskal = es.sortBy(e => (e._3, e._1, e._2)).flatMap { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; Some((a, b, w)) } else None
    }
    assert(msf.map(e => (e._1, e._2)).toSet ===
      kruskal.map(e => (e._1, e._2)).toSet)
    assert(msf.map(_._3).sum === kruskal.map(_._3).sum)
    assert(msf.length === 6) // V=7, one component
  }
}
