package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ContainmentTtrSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("containment dominates Jaccard on every common pair") {
    // inter/min(na,nb) ≥ inter/(na+nb−inter) always — and the pair set
    // at τ_c ≥ τ_j must superset the Jaccard pairs' intersection with
    // its own threshold
    val c = Dedup.containmentDup(spark, dir)
      .select(col("a"), col("b"), col("containment"))
    val j = Dedup.ngramJaccard(spark, dir)
      .select(col("a"), col("b"), col("jacc"))
    val both = c.join(j, Seq("a", "b"))
    assert(both.filter(col("containment") < col("jacc")).count() === 0L)
    // any Jaccard pair at ≥ ContainTau must appear in the containment set
    val missing = j.filter(col("jacc") >= Dedup.ContainTau)
      .join(c, Seq("a", "b"), "left_anti").count()
    assert(missing === 0L)
  }

  test("TTR is in (0, 1] and n_types never exceeds n_tokens") {
    val t = TextOps.typeTokenRatio(spark, dir)
    assert(t.filter(col("n_types") > col("n_tokens") ||
      col("ttr") <= 0 || col("ttr") > 1).count() === 0L)
    assert(t.count() > 0)
  }
}
