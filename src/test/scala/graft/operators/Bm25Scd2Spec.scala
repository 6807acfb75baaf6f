package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** BM25 retrieval and SCD2 dimension-history invariants. */
class Bm25Scd2Spec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("bm25: dense ranks, monotone scores, AND semantics hold") {
    val rows = TextOps.bm25TopDocs(spark, dir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet.subsetOf((0L until TextOps.BmQueries).toSet))
    byQ.foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ===
        (1L to g.length).toSeq)
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("score") >= b.getAs[Long]("score"))
      }
    }
    // AND semantics: every returned doc contains BOTH query terms
    val topTerms = TextOps.docs(spark, dir)
      .select(explode(TextOps.toks(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(2 * TextOps.BmQueries)
      .collect().map(_.getAs[String]("tok"))
    val queryTerms = topTerms.zipWithIndex
      .groupBy(_._2 / 2).view.mapValues(_.map(_._1).toSet).toMap
    val docToks = TextOps.docs(spark, dir)
      .select(col("doc_id"), TextOps.toks(col("text")).as("t"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[String](1).toSet).toMap
    rows.foreach { r =>
      val terms = queryTerms(r.getAs[Long]("qid").toInt)
      assert(terms.subsetOf(docToks(r.getAs[Long]("doc_id"))),
        s"doc misses a query term: $r")
    }
  }

  test("scd2: versions chain gaplessly, states actually change") {
    val rows = EventStreams.scd2(EventStreams.events(spark, dir)).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, g) =>
      val vs = g.sortBy(_.getAs[Long]("version"))
      assert(vs.map(_.getAs[Long]("version")).toSeq === (1L to g.length).toSeq)
      // exactly one open version, and it is the last
      assert(vs.count(_.getAs[Long]("valid_to_us") === -1L) === 1)
      assert(vs.last.getAs[Long]("valid_to_us") === -1L)
      vs.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("valid_to_us") === b.getAs[Long]("valid_from_us"),
          s"user $u: version intervals do not chain")
        assert(a.getAs[String]("state") !== b.getAs[String]("state"),
          s"user $u: consecutive versions share a state (not a change)")
      }
    }
  }
}
