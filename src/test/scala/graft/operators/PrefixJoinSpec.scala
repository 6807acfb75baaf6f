package graft.operators

import graft.SparkTestBase

/** Prefix-filtered similarity join: lossless vs the full path, and the
  * pruning genuinely shrinks the candidate set. */
class PrefixJoinSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("prefix join returns exactly the inverted-index Jaccard pairs") {
    val full = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val pref = Dedup.prefixJaccard(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pref === full)
    assert(pref.nonEmpty)
  }

  test("prefix candidates are a strict subset of the full expansion") {
    val (prefCand, fullCand) = Dedup.prefixCandidateCounts(spark, dir)
    assert(prefCand < fullCand,
      s"prefix filtering pruned nothing: $prefCand vs $fullCand")
    assert(prefCand > 0L)
  }
}
