package graft.operators

import graft.SparkTestBase

/** Data-quality suite, weighted sampling, grouping sets invariants. */
class DqSamplingSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("dq checks: five constraints, clean corpus passes all") {
    val rows = Olap.dqChecks(spark, dir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_violations") >= 0L)
      assert(r.getAs[Long]("pass") ===
        (if (r.getAs[Long]("n_violations") == 0L) 1L else 0L))
    }
    // the generated corpus is referentially clean by construction
    assert(rows.forall(_.getAs[Long]("pass") === 1L))
  }

  test("weighted sample: kept mass tracks the weight rule") {
    val rows = Pipeline.weightedSample(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(k <= n)
      // E[keep] = mean(n_chars)/Cap; kept docs skew longer
      val meanAll = r.getAs[Long]("chars_total").toDouble / n
      if (k > 0) {
        val meanKept = r.getAs[Long]("chars_kept").toDouble / k
        assert(meanKept >= meanAll,
          s"weighted rule must favor longer docs: $r")
      }
    }
  }

  test("lang eval: matrix partitions the corpus, diagonal dominates") {
    val rows = TextOps.langEval(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === TextOps.docs(spark, dir).count())
    val correct = rows.map(_.getAs[Long]("n_correct")).sum
    // the synthetic corpus's text only partially tracks its lang
    // labels (word-soup skews English) — the eval's JOB is to report
    // that honestly; the spec pins "beats 5-class random", not a
    // quality bar the corpus cannot support (measured ~0.39)
    assert(correct.toDouble / total > 0.25,
      s"langId accuracy ${correct.toDouble / total} below random")
    rows.foreach { r =>
      val expect = if (r.getAs[String]("lang") == r.getAs[String]("pred"))
        r.getAs[Long]("n") else 0L
      assert(r.getAs[Long]("n_correct") === expect)
    }
  }

  test("zorder: buckets partition the table with sane envelopes") {
    val rows = Olap.zorderReport(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === graft.sources.Tpch.table(spark, dir, "orders").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("min_cust") <= r.getAs[Long]("max_cust"))
      assert(r.getAs[Long]("min_day") <= r.getAs[Long]("max_day"))
    }
    // interleaving must actually subdivide: more than one z bucket
    assert(rows.length > 1)
  }

  test("correlation: bounded and computed over every order") {
    val r = Olap.orderCorr(spark, dir).collect().head
    val corr = r.getAs[Double]("corr")
    // the synthetic o_totalprice is drawn independently of the line
    // rows, so near-zero is the truthful value — the spec pins only
    // the Cauchy-Schwarz bound
    assert(corr >= -1.0 && corr <= 1.0)
    assert(r.getAs[Long]("n") ===
      graft.sources.Tpch.table(spark, dir, "orders").count())
  }

  test("grouping sets: per-level totals all equal the table total") {
    val rows = Olap.groupingSets(spark, dir).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet === Set(1L, 2L, 3L)) // (flag), (status), ()
    val totals = byGid.view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    assert(totals.values.toSet.size === 1,
      s"every grouping level must partition all rows: $totals")
  }
}
