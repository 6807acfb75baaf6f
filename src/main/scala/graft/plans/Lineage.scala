package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative driver loops.
  *
  * `Dataset.localCheckpoint(eager = true)` truncates the LOGICAL
  * lineage (planning stays O(1) per round) but, since Spark 3.4, the
  * resulting `LogicalRDD` carries the checkpointed plan's `originStats`
  * forward. In a loop whose per-round plan joins the previous round's
  * checkpoint against itself (pointer doubling) or feeds it back
  * through a join+aggregate (color/min-label propagation), the
  * estimated `sizeInBytes` therefore *squares* (or doubles its bit
  * length) every round: after a few dozen rounds the carried `BigInt`
  * has millions of digits and `SizeInBytesOnlyStatsPlanVisitor`'s
  * product turns into minutes of Toom-Cook `BigInteger` multiplication
  * on the driver — the job looks hung while burning one core on stats
  * arithmetic.
  *
  * [[pin]] breaks the feedback: checkpoint eagerly, then rebuild the
  * frame around the SAME materialized `InternalRow` RDD with the
  * cached blocks' MEASURED byte size as its statistics
  * ([[org.apache.spark.sql.graft.PinnedCheckpoint.repin]]). Measured
  * stats cannot compound (they are read from the block manager each
  * round, not derived from the previous round's estimate), there is no
  * `Row ⇄ InternalRow` conversion pass, and — unlike the earlier
  * `createDataFrame(ck.rdd, schema)` rebuild, which had NO stats and
  * therefore planned every join against a pinned table as a shuffle —
  * small pinned frames (frontiers, dead sets, per-component tables)
  * auto-broadcast again.
  *
  * Use [[pin]] for any frame that is BOTH checkpointed per round AND
  * joined (directly or transitively) against itself in the next
  * round's plan. Frames only joined against static inputs grow their
  * stats linearly and plain `localCheckpoint(true)` is fine.
  */
object Lineage {
  def pin(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.PinnedCheckpoint.repin(df)
}
