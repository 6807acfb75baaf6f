package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Contract of the round-7 [[Lineage.pin]] rework
  * ([[org.apache.spark.sql.graft.PinnedCheckpoint]]): same data, no
  * Row round-trip, MEASURED finite stats (so small pinned frames
  * auto-broadcast — the r6 ADVICE finding), and no stats compounding
  * through a self-referencing loop. */
class LineagePinSpec extends SparkTestBase {
  import spark.implicits._

  test("pin preserves schema and data") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, null)).toDF("id", "s")
    val p = Lineage.pin(df)
    assert(p.schema === df.schema)
    assert(p.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
  }

  test("pinned frame carries finite measured stats, not the Long.MaxValue default") {
    val p = Lineage.pin(spark.range(1000).toDF("id"))
    val size = p.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size > 0)
    assert(size < BigInt(Long.MaxValue) / 4,
      s"stats fell back to defaultSizeInBytes ($size)")
  }

  test("small pinned frame auto-broadcasts against a larger side") {
    val small = Lineage.pin(spark.range(100).toDF("id"))
    val big = spark.range(500000).toDF("id")
    val joined = big.join(small, "id")
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"expected broadcast join, got:\n$physical")
  }

  test("stats stay bounded through a pointer-doubling style loop") {
    var p = Lineage.pin(spark.range(64).toDF("id")
      .select(col("id").as("c"), (col("id") / 2).cast("long").as("p")))
    for (_ <- 1 to 12) {
      val q = p.select(col("c").as("jc"), col("p").as("jp"))
      p = Lineage.pin(p.join(q, col("p") === col("jc"))
        .select(col("c"), col("jp").as("p")))
    }
    val size = p.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size < BigInt(10L * 1024 * 1024),
      s"stats compounded through the loop ($size)")
  }
}
