package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** whitenNorms: z-scores must satisfy the exact rank-one identity
  * Σ_vectors (n·x − S)²/V = n per dimension, so the corpus-wide sum of
  * whitened squared norms is n_valid · n_dims — a full-strength check
  * of the stats pass, the array pivot, and the fold, independent of
  * the oracle. */
class EmbWhitenSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("sum of whitened norms equals n_valid * n_dims") {
    val w = Similarity.whitenNorms(spark, dir)
    val nValid = w.count()
    val dims = Similarity.dimStats(spark, dir).count()
    val total = w.agg(sum("wnorm2")).head().getDouble(0)
    val expected = nValid.toDouble * dims
    // each of n_valid terms is rounded to 6 decimals
    assert(math.abs(total - expected) <= nValid * 1e-6 + 1e-6,
      s"total=$total expected=$expected")
  }

  test("whitened norms are non-negative and finite") {
    val bad = Similarity.whitenNorms(spark, dir)
      .filter(col("wnorm2") < 0 || col("wnorm2").isNull ||
        col("wnorm2") === Double.PositiveInfinity)
      .count()
    assert(bad === 0L)
  }
}
