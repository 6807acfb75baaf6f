package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Stats-safe eager checkpoint for iterative driver loops — the engine
  * half of [[graft.plans.Lineage]] (see its scaladoc for WHY a plain
  * `localCheckpoint` compounds its `originStats` estimate through a
  * self-referencing loop until driver-side stats arithmetic dominates).
  *
  * `localCheckpoint(eager = true)` materializes the frame and truncates
  * lineage, but since Spark 3.4 the resulting [[LogicalRDD]] carries the
  * checkpointed PLAN's estimated statistics forward (`originStats`), so
  * a loop that feeds round k's checkpoint into round k+1's joins squares
  * the estimate every round. The previous fix —
  * `createDataFrame(ck.rdd, schema)` — broke the feedback but had two
  * real costs the round-6 review flagged:
  *
  *  1. `ck.rdd` deserializes `InternalRow → Row`, and the rebuilt frame
  *     re-serializes `Row → InternalRow` on every consumption — a full
  *     per-round conversion pass over the pinned table.
  *  2. The rebuilt `LogicalRDD` has NO stats, so `sizeInBytes` falls
  *     back to `spark.sql.defaultSizeInBytes` (Long.MaxValue) and
  *     frames that should auto-broadcast (per-round frontiers, dead
  *     sets, component tables) always plan as shuffle joins.
  *
  * [[repin]] keeps the checkpoint's own `InternalRow` RDD (no
  * conversion) and replaces `originStats` with MEASURED statistics: the
  * cached blocks' actual in-memory + on-disk bytes from the block
  * manager (`getRDDStorageInfo`), which is exact for the materialized
  * table and — critically — does not compound, because it is read from
  * storage each round rather than derived from the previous round's
  * estimate. Joins against a pinned small table auto-broadcast again.
  *
  * This lives under `org.apache.spark.sql` because [[LogicalRDD]]'s
  * constructor and [[Dataset.ofRows]] are `private[sql]` — the same
  * access level any custom `SparkStrategy`/`SparkPlan` integration
  * needs. No behavior of the engine depends on Spark internals beyond
  * this one constructor call; if it ever breaks on a Spark upgrade the
  * `createDataFrame` fallback below is semantically identical.
  */
object PinnedCheckpoint {
  def repin(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    val session = ck.sparkSession.asInstanceOf[ClassicSession]
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val measured = session.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => (i.memSize + i.diskSize).max(1L))
        val stats = measured.map(b => Statistics(sizeInBytes = BigInt(b)))
        val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(
          session, stats, None)
        Dataset.ofRows(session, fresh)
      case _ =>
        // localCheckpoint always yields a LogicalRDD today; keep a
        // public-API fallback so a Spark upgrade degrades, not breaks.
        ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    }
  }
}
