package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.TpchGraph

/** Independent-implementation checks for the round-5 link-analysis and
  * embedding-moment operators: [[Hits]] against a driver-side scalar
  * re-implementation of the same integer fixed point (no Spark, no
  * SQL — a third engine), and [[Similarity.gramMatrix]] against a
  * brute-force pairwise product over the collected corpus. */
class HitsGramSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("HITS top authorities equal a driver-side scalar reference") {
    val edges = TpchGraph.relsLite(spark, dir).select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = TpchGraph.nodes(spark, dir).select("id")
      .collect().map(_.getLong(0))

    // the same divisor-normalized half-steps, scalar form
    def half(score: Map[Long, Long], out: (Long, Long) => Long,
        in: (Long, Long) => Long): Map[Long, Long] = {
      val raw = edges.groupBy(e => in(e._1, e._2))
        .map { case (n, es) =>
          n -> es.map(e => score.getOrElse(out(e._1, e._2), 0L)).sum }
      val d = (if (raw.isEmpty) 0L else raw.values.max) / Hits.Scale + 1
      nodes.map(n => n -> raw.getOrElse(n, 0L) / d).toMap
    }
    var h = nodes.map(_ -> Hits.Scale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 0 until Hits.Iters) {
      a = half(h, (s, _) => s, (_, d) => d) // auth(v) ← Σ h(u) over u→v
      h = half(a, (_, d) => d, (s, _) => s) // hub(u) ← Σ a(v) over u→v
    }
    val expect = a.toSeq.map { case (n, av) => (av, n) }
      .sortBy { case (av, n) => (-av, n) }.take(Hits.TopK)
      .zipWithIndex
      .map { case ((av, n), i) => (i + 1, n, av, h(n)) }

    val got = Hits.topAuthorities(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect)
    assert(got.head._3 > 0L) // fixed point didn't collapse to zero
  }

  test("gram matrix equals brute-force pairwise products") {
    val rows = Similarity.quantized(spark, dir).select("vec_id", "q")
      .collect().map(_.getSeq[Long](1).toArray)
    val d = rows.head.length
    val got = Similarity.gramMatrix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    assert(got.size === d * (d + 1) / 2) // full upper triangle present
    val sums = Array.tabulate(d)(i => rows.map(_(i)).sum)
    for (i <- 0 until d; j <- i until d) {
      val sxy = rows.map(q => q(i) * q(j)).sum
      assert(got((i + 1L, j + 1L)) ===
        ((rows.length.toLong, sxy, sums(i), sums(j))),
        s"cell ($i,$j)")
    }
  }
}
