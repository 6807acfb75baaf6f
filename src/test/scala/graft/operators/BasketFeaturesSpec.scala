package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** basketFeatures vs a direct driver-side recomputation: collect the
  * featured parts per order and sum vectors by hand. */
class BasketFeaturesSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("per-order norm2 and n_feat match a by-hand vector sum") {
    val out = GraphOps.basketFeatures(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.nonEmpty)

    val feats = Similarity.quantizedCached(spark, dir)
      .select("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val li = graft.sources.Tpch.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val byOrder = li.filter { case (_, pk) => feats.contains(pk) }
      .groupBy(_._1)
    assert(out.keySet === byOrder.keySet)
    byOrder.foreach { case (ok, rows) =>
      val vecs = rows.map { case (_, pk) => feats(pk) }
      val dims = vecs.head.indices
      val sums = dims.map(j => vecs.map(_(j)).sum)
      val norm2 = sums.map(s => s * s).sum
      assert(out(ok) === ((vecs.size.toLong, norm2)), s"order $ok")
    }
  }
}
