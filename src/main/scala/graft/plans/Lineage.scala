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
  * frame from the materialized RDD. The rebuilt `LogicalRDD` has no
  * origin stats, so each round's estimate restarts from the session
  * default instead of compounding. The extra Row conversion pass runs
  * over component-sized per-round tables only (≤ V rows), never over
  * the corpus.
  *
  * Use [[pin]] for any frame that is BOTH checkpointed per round AND
  * joined (directly or transitively) against itself in the next
  * round's plan. Frames only joined against static inputs grow their
  * stats linearly and plain `localCheckpoint(true)` is fine.
  */
object Lineage {
  def pin(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
