package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Random-walk corpus and HyperBall harmonic centrality: conservation,
  * reachability, determinism, and sketch-monotonicity invariants. */
class WalksHarmonicSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private lazy val visits = Walks.walkVisits(spark, dir).collect()

  test("walk mass is conserved: every step carries all walks") {
    // symmetrized adjacency has every customer (IN_NATION edge), and a
    // walk can always advance — so per-step visit totals are constant
    val perStep = visits.groupBy(_.getAs[Int]("step"))
      .view.mapValues(_.map(_.getAs[Long]("n_visits")).sum).toMap
    assert(perStep.keySet === (0 to Walks.Steps).toSet)
    val total = perStep(0)
    assert(total > 0)
    (1 to Walks.Steps).foreach(s => assert(perStep(s) === total,
      s"step $s lost walks: ${perStep(s)} vs $total"))
  }

  test("step 0 is exactly the customer seeds; step 1 leaves them") {
    val step0 = visits.filter(_.getAs[Int]("step") === 0)
    assert(step0.map(_.getAs[String]("kind")).toSet === Set("customer"))
    // a customer's neighbors are nation (IN_NATION) and order
    // (PLACED_BY reversed) nodes only
    val kinds1 = visits.filter(_.getAs[Int]("step") === 1)
      .map(_.getAs[String]("kind")).toSet
    assert(kinds1.subsetOf(Set("nation", "order")))
  }

  test("walk draw is deterministic: a recomputed corpus is identical") {
    val again = Walks.walkVisits(spark, dir).collect()
    assert(again.toSet === visits.toSet)
  }

  private lazy val harm = HyperBall.harmonic(spark, dir).collect()

  test("harmonic rows: TopN winners, per-round z monotone non-increasing") {
    assert(harm.length === HyperBall.TopN)
    harm.foreach { r =>
      // registers only grow round over round, so z (inverse mass) falls
      val zs = (0 to HyperBall.Iters).map(t => r.getAs[Long](s"z$t"))
      zs.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
      assert(r.getAs[Double]("harmonic") > 0.0,
        s"ball growth must be positive for a top-ball node: $r")
    }
  }

  test("harmonic and hyperball agree on the winner set and final z") {
    val hb = HyperBall.hyperball(spark, dir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("z")).toMap
    harm.foreach { r =>
      val n = r.getAs[Long]("node")
      assert(hb.contains(n))
      assert(hb(n) === r.getAs[Long](s"z${HyperBall.Iters}"))
    }
  }
}
