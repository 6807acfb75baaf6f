package graft.operators

import graft.SparkTestBase
import graft.model.TpchGraph
import graft.sources.Tpch

/** Independent-implementation checks for [[Stress]] (sampled stress
  * centrality) and [[TextOps.cooccurTopK]] (skip-gram co-occurrence):
  * each against a driver-side scalar re-implementation — a third
  * engine besides Spark and the DuckDB oracle. */
class StressCooccurSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("stress centrality equals a scalar BFS/DAG-count reference") {
    val rels = TpchGraph.relsLite(spark, dir).select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (rels ++ rels.map(e => (e._2, e._1))).distinct
    val out: Map[Long, Array[Long]] =
      edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val none = Array.empty[Long]
    val landmarks = TpchGraph.nodes(spark, dir)
      .filter(org.apache.spark.sql.functions.col("kind") === "region")
      .select("id").collect().map(_.getLong(0))

    val stress = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (r <- landmarks) {
      // forward: sigma per level, exactly Depth levels
      var levels = List(Map(r -> 1L))
      var seen = Set(r)
      for (_ <- 1 to Stress.Depth) {
        val next = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((u, s) <- levels.head; v <- out.getOrElse(u, none)
             if !seen.contains(v)) next(v) += s
        seen ++= next.keySet
        levels ::= next.toMap
      }
      // backward: continuation counts, deepest level (head) first
      var c = levels.head.map { case (n, _) => n -> 1L } // c − 1 = 0 there
      for (lv <- levels.tail) {
        val cs = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((w, cw) <- c; u <- out.getOrElse(w, none) if lv.contains(u))
          cs(u) += cw
        c = lv.map { case (n, s) =>
          if (lv ne levels.last) stress(n) += s * cs(n) // c − 1 = cs
          n -> (1L + cs(n))
        }
      }
    }
    val expect = stress.toSeq.filterNot { case (n, _) => landmarks.contains(n) }
      .sortBy { case (n, s) => (-s, n) }.take(Stress.TopK).zipWithIndex
      .map { case ((n, s), i) => (i + 1, n, s) }

    val got = Stress.topStress(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === expect)
    assert(got.exists(_._3 > 0L))
  }

  test("co-occurrence top-k equals a brute-force scalar count") {
    val texts = Tpch.table(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.col("text")))
      .collect().map(_.getString(0))
    val counts = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for (t <- texts) {
      val w = t.trim.split("\\s+")
      for (i <- w.indices; j <- (i + 1) until math.min(i + 1 + TextOps.CoWindow, w.length))
        counts((w(i), w(j))) += 1L
    }
    val expect = counts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(TextOps.CoK)
      .map { case ((a, b), n) => (a, b, n) }

    val got = TextOps.cooccurTopK(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === expect)
  }
}
