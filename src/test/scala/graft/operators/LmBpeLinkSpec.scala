package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariants for the bigram-LM quality score, the BPE pair table, and
  * resource-allocation link prediction. */
class LmBpeLinkSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("lmScore: one row per multi-token doc, probabilities bounded") {
    val multi = TextOps.tokenTable(spark, dir)
      .filter(size(col("t")) >= 2).count()
    val rows = TextOps.lmScore(spark, dir).collect()
    assert(rows.length.toLong === multi)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val s = r.getAs[Long]("score_micro")
      val a = r.getAs[Long]("avg_micro")
      assert(n >= 1L)
      // each scaled conditional probability is in (0, LmScale]:
      // c(bigram) >= 1 and c(bigram) <= c(prev)
      assert(s >= 1L && s <= n * TextOps.LmScale, s"score out of range: $r")
      assert(a === s / n)
    }
  }

  test("lmScore: total bigram positions equal Σ(len-1) over multi-token docs") {
    val expected = TextOps.tokenTable(spark, dir)
      .filter(size(col("t")) >= 2)
      .agg(sum(size(col("t")) - 1)).collect().head.getLong(0)
    val total = TextOps.lmScore(spark, dir)
      .agg(sum("n_bigrams")).collect().head.getLong(0)
    assert(total === expected)
  }

  test("bpePairs: exactly K rows, counts descending, pairs 2 chars") {
    val rows = TextOps.bpePairs(spark, dir).collect()
    assert(rows.length === TextOps.BpePairK)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[String]("pair").length === 2)
      assert(r.getAs[Long]("n") >= 1L)
    }
  }

  test("bpePairs: counts are exact vs a direct recount of the top pair") {
    val top = TextOps.bpePairs(spark, dir).collect().head
    val pair = top.getAs[String]("pair")
    val direct = TextOps.docs(spark, dir)
      .select(explode(TextOps.toks(lower(col("text")))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("p"))
      .filter(col("p") === pair).count()
    assert(top.getAs[Long]("n") === direct)
  }

  test("linkPrediction: scores bounded by common-neighbor count, pairs ordered") {
    val rows = GraphOps.linkPrediction(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= GraphOps.RaTopK)
    rows.foreach { r =>
      val cn = r.getAs[Long]("cn")
      val ra = r.getAs[Long]("ra_micro")
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      // each shared part contributes RaScale div pd with 1 <= pd <= cap:
      // floor(RaScale/cap) <= term <= RaScale
      assert(ra <= cn * GraphOps.RaScale)
      assert(ra >= cn * (GraphOps.RaScale / GraphOps.SimDfCap))
    }
    val ras = rows.map(_.getAs[Long]("ra_micro"))
    assert(ras.zip(ras.tail).forall { case (a, b) => a >= b })
  }

  test("hashFeatures: buckets sum to token count, dims fixed, plan shuffle-free") {
    val rows = TextOps.hashFeatures(spark, dir)
      .join(TextOps.tokenTable(spark, dir), "doc_id")
      .select(col("doc_id"), col("dim"), col("n"), size(col("t")).as("n_toks"))
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, g) =>
      assert(g.map(_.getAs[Long]("dim")).sorted.toSeq ===
        (0L until TextOps.HashDim.toLong).toSeq, s"doc $id dims")
      assert(g.map(_.getAs[Long]("n")).sum ===
        g.head.getAs[Int]("n_toks").toLong, s"doc $id lost tokens")
      assert(g.forall(_.getAs[Long]("n") >= 0L))
    }
    // featurization must stay map-only ABOVE the cached token table —
    // the one-time cache fill below InMemoryTableScan legitimately
    // repartitions (single-row-group scan spreading, round 7), so the
    // assert scopes to the consuming plan
    val p = TextOps.hashFeatures(spark, dir)
      .queryExecution.executedPlan.toString
    val consuming = p.split("InMemoryTableScan").head
    assert(!consuming.contains("Exchange"), p)
  }

  test("lmScore and linkPrediction are memoized per (session, dir)") {
    assert(TextOps.lmScore(spark, dir) eq TextOps.lmScore(spark, dir))
    assert(GraphOps.linkPrediction(spark, dir) eq
      GraphOps.linkPrediction(spark, dir))
  }

  test("linkPrediction: a pair's cn equals its recomputed shared-part count") {
    val top = GraphOps.linkPrediction(spark, dir).collect().head
    val (a, b) = (top.getAs[Long]("a"), top.getAs[Long]("b"))
    val sp = graft.sources.Tpch.table(spark, dir, "lineitem")
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
    val capped = sp.groupBy("p").agg(count(lit(1)).as("pd"))
      .filter(col("pd") <= GraphOps.SimDfCap)
    val shared = sp.filter(col("s") === a).join(capped, "p")
      .join(sp.filter(col("s") === b).select(col("p")), "p").count()
    assert(top.getAs[Long]("cn") === shared)
  }
}
