package graft.operators

import graft.SparkTestBase

/** SemDeDup: cluster census invariants over the seeded dup corpus
  * (originals ∪ perturbed copy — every original has one near-exact
  * semantic duplicate planted). */
class SemDedupSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = Similarity.semDedup(spark, dir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("every corpus vector is assigned to exactly one cluster") {
    val corpusSize = 2L * Similarity.quantized(spark, dir).count()
    assert(rows.map(_._2).sum === corpusSize)
    assert(rows.forall { case (_, members, _) => members >= 1 })
  }

  test("each cluster keeps at least one member") {
    rows.foreach { case (cid, members, dropped) =>
      assert(dropped < members, s"cluster $cid dropped everything")
      assert(dropped >= 0)
    }
  }

  test("the planted perturbed duplicates are substantially detected") {
    // half the corpus is a +1-milliunit copy at cos ~ 1 >> 0.95; pairs
    // are only missed when the copy crosses a cluster boundary
    val (members, dropped) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(dropped.toDouble / members > 0.35,
      s"dropped=$dropped of members=$members")
  }

  test("memoized: repeated call returns the identical census") {
    val again = Similarity.semDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.sameElements(rows.sorted))
  }
}
