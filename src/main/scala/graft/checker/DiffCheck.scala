package graft.checker

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Stores

/** Incremental (diff) consistency check — SURVEY.md §2.5 T1-T3 / §2.3
  * J12: the reference applies `checkChange` predicates to the
  * changed-record stream of each committed transaction
  * (checking/incremental/IncrementalDiffCheck.java,
  * NodeRecordCheck.checkChange:91-102, @IncrementalOnly predicates
  * ConsistencyReport.java:54-56,124-127).
  *
  * A transaction's DiffStore is the per-store set of (old, new) record
  * pairs. The core incremental predicate family is "...NotUpdated":
  * when a chain pointer changes, the record it USED to point at must
  * itself be part of the same transaction (its back-pointer had to
  * change too) — otherwise the tx left a dangling back-reference.
  * Re-expressed relationally: diff ⋈ diff anti-joins on the old pointer
  * value.
  *
  * The streaming form treats each micro-batch as one transaction and
  * runs [[violations]] per batch via foreachBatch (stream-static:
  * the diff is the stream, nothing else is needed because every
  * predicate is internal to the tx's own change set).
  */
object DiffCheck {
  private val NIL = -1L

  /** (old, new) pairs of one store whose watched columns changed. */
  def diff(old: DataFrame, neu: DataFrame, cols: Seq[String]): DataFrame = {
    val o = old.select(col("id") +: cols.map(c => col(c).as(s"o_$c")): _*)
    val n = neu.select(col("id") +: cols.map(c => col(c).as(s"n_$c")): _*)
    o.join(n, "id")
      .filter(cols.map(c => col(s"o_$c") =!= col(s"n_$c")).reduce(_ || _))
  }

  /** All checkChange violations of one transaction given the old and
    * new store bundles. */
  def violations(oldS: Stores, newS: Stores): DataFrame = {
    val nodeDiff = diff(oldS.nodes, newS.nodes,
      Seq("in_use", "next_rel", "next_prop"))
    val relDiff = diff(oldS.rels, newS.rels, Seq("type_id", "first_next"))
    val propDiff = diff(oldS.props, newS.props, Seq("prev_prop"))
    val relDiffIds = relDiff.select(col("id").as("did"))
    val propDiffIds = propDiff.select(col("id").as("did"))

    // node.next_rel changed ⇒ the old first rel must be in the tx
    val relNotUpdated = nodeDiff
      .filter(col("o_next_rel") =!= col("n_next_rel") && col("o_next_rel") =!= NIL)
      .join(relDiffIds, col("o_next_rel") === col("did"), "left_anti")
      .select(lit("node").as("record_type"),
        lit("relationship_not_updated").as("violation"), col("id").as("record_id"))

    // node.next_prop changed ⇒ the old chain head must be in the tx
    val propNotUpdated = nodeDiff
      .filter(col("o_next_prop") =!= col("n_next_prop") && col("o_next_prop") =!= NIL)
      .join(propDiffIds, col("o_next_prop") === col("did"), "left_anti")
      .select(lit("node").as("record_type"),
        lit("property_not_updated").as("violation"), col("id").as("record_id"))

    // rel.first_next changed ⇒ the old next rel must be in the tx
    val nextRelNotUpdated = relDiff
      .filter(col("o_first_next") =!= col("n_first_next") && col("o_first_next") =!= NIL)
      .join(relDiffIds, col("o_first_next") === col("did"), "left_anti")
      .select(lit("relationship").as("record_type"),
        lit("next_relationship_not_updated").as("violation"), col("id").as("record_id"))

    relNotUpdated.unionAll(propNotUpdated).unionAll(nextRelNotUpdated)
  }
}
