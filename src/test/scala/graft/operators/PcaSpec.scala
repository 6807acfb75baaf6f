package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** pcaProject / powerIterate invariants, independent of the oracle. */
class PcaSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("powerIterate finds the known eigenpair of a hand matrix") {
    // [[2,1],[1,2]]: top eigenvector (1,1), eigenvalue 3 — with
    // all-ones start and max-abs normalization, every round is exact
    val c = Array.ofDim[Double](3, 3)
    c(1)(1) = 2.0; c(1)(2) = 1.0; c(2)(1) = 1.0; c(2)(2) = 2.0
    val (v, lambda) = Similarity.powerIterate(c, 2, Similarity.PcaIters)
    assert(v(0) === 1.0 && v(1) === 1.0)
    assert(lambda === 3.0)
  }

  test("powerIterate converges toward the dominant axis when skewed") {
    // diag(10, 1): dominant axis e1; after 8 rounds the off-axis
    // component has decayed by 10^-8
    val c = Array.ofDim[Double](3, 3)
    c(1)(1) = 10.0; c(2)(2) = 1.0
    val (v, lambda) = Similarity.powerIterate(c, 2, Similarity.PcaIters)
    assert(v(0) === 1.0)
    assert(math.abs(v(1)) < 1e-7)
    assert(math.abs(lambda - 10.0) < 1e-6)
  }

  test("corpus projection variance dominates every coordinate axis") {
    // the top-PC direction (as found) must explain at least as much
    // centered variance as any single original dimension — the
    // defining property PCA is used for. Compare n²·Var(proj)/|v|²
    // against the per-dim n²·Var = V from the whitening stats.
    val proj = Similarity.pcaProject(spark, dir)
    val n = proj.count()
    val st = proj.agg(sum("proj").as("s"), sum(col("proj") * col("proj")).as("ss"))
      .head()
    val varNum = n * st.getDouble(1) - st.getDouble(0) * st.getDouble(0)
    // |v|² from the same driver-side artifact the operator used
    val rows = Similarity.gramMatrix(spark, dir).collect()
    val d = rows.iterator.map(_.getLong(1)).max.toInt
    val nv = rows.iterator.map(_.getLong(2)).max
    val c = Array.ofDim[Double](d + 1, d + 1)
    rows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val cv = (nv * r.getLong(3) - r.getLong(4) * r.getLong(5)).toDouble
      c(i)(j) = cv; c(j)(i) = cv
    }
    val (v, _) = Similarity.powerIterate(c, d, Similarity.PcaIters)
    val v2 = v.map(x => x * x).sum
    val perDimMax = (1 to d).map(i => c(i)(i)).max
    // proj = n·(x−μ)ᵀv, so n·Σproj² carries n² beyond vᵀCv: the
    // Rayleigh quotient is varNum / (n²·|v|²), to compare against C's
    // diagonal (itself the per-axis Rayleigh numerator)
    val rayleigh = varNum / (nv.toDouble * nv * v2)
    assert(rayleigh >= perDimMax * 0.999,
      s"rayleigh=$rayleigh maxDimVar=$perDimMax")
  }
}
