package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TextOps

/** The O(n) Rabin-Karp expression must equal the O(n·k)
  * hash-every-substring form it replaced, gram for gram. */
class GramHashesSpec extends SparkTestBase {
  import spark.implicits._

  private def legacy(k: Int) =
    s"""CASE WHEN length(s) >= $k
       |  THEN transform(sequence(1, length(s) - $k + 1),
       |                 p -> graft_polyhash(substring(s, p, $k)))
       |  ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin

  test("GramHashes equals per-substring PolyHash for several k") {
    TextOps.ensureRegistered(spark)
    val samples = Seq("", "a", "abcdefgh", "abcdefg", // below/at k=8
      "the quick brown fox jumps over 123", "aaaaaaaaaaaaaaa",
      "w123 w99887 w5 w4433221100 w6", "x" * 300)
    val df = samples.toDF("s")
    for (k <- Seq(2, 8, 25)) {
      val bad = df
        .withColumn("native", expr(s"graft_gram_hashes(s, $k)"))
        .withColumn("legacy", expr(legacy(k)))
        .filter(col("native") =!= col("legacy")).count()
      assert(bad === 0L, s"k=$k mismatch")
    }
  }

  test("GramHashes equals it on the real corpus at WinnowK") {
    TextOps.ensureRegistered(spark)
    val bad = TextOps.docs(spark, "/root/testdata/sf0.001")
      .select(col("text").as("s"))
      .withColumn("native", expr(s"graft_gram_hashes(s, ${TextOps.WinnowK})"))
      .withColumn("legacy", expr(legacy(TextOps.WinnowK)))
      .filter(col("native") =!= col("legacy")).count()
    assert(bad === 0L)
  }

  test("GramHashes participates in whole-stage codegen") {
    TextOps.ensureRegistered(spark)
    val plan = spark.range(50)
      .selectExpr("graft_gram_hashes(CAST(id AS STRING), 2) AS g")
      .queryExecution.executedPlan.toString
    // "*(1) Project [graft_gram_hashes(...)]" — the * prefix IS the
    // whole-stage-codegen marker in the executed plan rendering
    assert(plan.contains("*(1) Project [graft_gram_hashes"), plan)
  }
}
