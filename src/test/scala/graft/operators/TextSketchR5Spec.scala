package graft.operators

import graft.SparkTestBase

/** KMV sketch, boilerplate removal, and chunking invariants. */
class TextSketchR5Spec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("kmv: full sketch, estimate within 4 sigma of exact") {
    val r = Sketch.kmvOrders(spark, dir).collect().head
    assert(r.getAs[Long]("k") === Sketch.KmvK.toLong)
    val est = r.getAs[Double]("est")
    val exact = r.getAs[Long]("exact").toDouble
    // KMV relative sigma ~ 1/sqrt(k-2) ~ 6.3%
    assert(math.abs(est - exact) / exact < 0.25, s"est=$est exact=$exact")
  }

  test("boilerplate: one row per doc, counts and keep rule consistent") {
    val docs = TextOps.docs(spark, dir).count()
    val rows = TextOps.boilerplate(spark, dir).collect()
    assert(rows.length.toLong === docs)
    rows.foreach { r =>
      val (g, b) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_bp"))
      assert(b >= 0L && b <= g)
      val expect = if (b * TextOps.BpMaxDen <= g * TextOps.BpMaxNum) 1L else 0L
      assert(r.getAs[Long]("keep") === expect)
    }
  }

  test("chunking: geometry covers every token exactly once per stride") {
    val rows = TextOps.chunkStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val c = r.getAs[Long]("n_chunks")
      val last = r.getAs[Long]("last_len")
      assert(c >= 1L)
      assert(last >= 1L && last <= TextOps.ChunkW)
      // chunk starts advance by the stride; the tail is what remains
      assert((c - 1) * TextOps.ChunkS + last === n,
        s"stride coverage broken: $r")
      if (n > TextOps.ChunkW)
        assert(c === (n - TextOps.ChunkW + TextOps.ChunkS - 1) / TextOps.ChunkS + 1)
    }
  }
}
