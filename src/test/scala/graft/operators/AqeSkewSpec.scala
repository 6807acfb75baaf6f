package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** AQE skew-join — the runtime complement to [[Salt]]'s explicit
  * two-phase aggregation (SCALE.md "salting for skew, AQE for runtime
  * re-plan"): a join whose shuffle produces one oversized partition is
  * re-planned at runtime, the hot partition split across tasks. The
  * spec pins that the engine configuration actually activates the
  * optimization (skew=true on the merge join) and that results are
  * unchanged by the re-plan. */
class AqeSkewSpec extends SparkTestBase {

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a skewed shuffle join is split at runtime (skew=true) with unchanged results") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB") {
      // 95% of fact rows share key 0 -> one reducer partition dwarfs
      // the rest after the shuffle
      val fact = spark.range(200000).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS DataFrame's own query execution, so the
      // adaptive plan below is the final (re-planned) one
      val rows = joined.collect()
      // every fact row finds exactly one dim row
      assert(rows.length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"), plan)
    }
  }
}
