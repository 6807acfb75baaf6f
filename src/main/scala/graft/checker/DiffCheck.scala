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
  * pairs. The core incremental predicate family is "...NotUpdated"
  * (ConsistencyReport.java:233-266): when a chain pointer changes, the
  * record it USED to point at must itself be part of the same
  * transaction (its back-pointer had to change too) — otherwise the tx
  * left a dangling back-reference. Re-expressed relationally:
  * diff ⋈ diff anti-joins on the old pointer value. The full family:
  *
  *  - node.next_rel          → relationship_not_updated
  *  - node.next_prop         → property_not_updated
  *  - rel.first_prev/next,
  *    rel.second_prev/next   → source/target_prev/next_not_updated ×4
  *    (the reference's RelationshipField NotUpdated quartet)
  *  - rel.next_prop          → property_not_updated (rel owner kind)
  *  - neo.next_prop          → property_not_updated (neostore kind)
  *  - prop.prev/next_prop    → prev/next_property_not_updated
  *
  * The streaming form treats each micro-batch as one transaction and
  * runs [[violations]] per batch via foreachBatch (stream-static:
  * the diff is the stream, nothing else is needed because every
  * predicate is internal to the tx's own change set).
  */
object DiffCheck {
  private val NIL = -1L

  /** One transaction's DiffStore: per-store (old, new) pairs of the
    * changed records, columns id + o_c/n_c per watched column. At
    * scale this ARRIVES small (from the tx log / CDC source); the
    * snapshot-join [[diff]] below exists for callers that only hold
    * two store versions. */
  final case class TxDiffs(nodes: DataFrame, rels: DataFrame,
    props: DataFrame, neo: DataFrame)

  /** (old, new) pairs of one store whose watched columns changed —
    * the snapshot⋈snapshot fallback construction. */
  def diff(old: DataFrame, neu: DataFrame, cols: Seq[String]): DataFrame = {
    val o = old.select(col("id") +: cols.map(c => col(c).as(s"o_$c")): _*)
    val n = neu.select(col("id") +: cols.map(c => col(c).as(s"n_$c")): _*)
    o.join(n, "id")
      .filter(cols.map(c => col(s"o_$c") =!= col(s"n_$c")).reduce(_ || _))
  }

  /** "old pointer must be in the tx" for one melted pointer table:
    * ptrs(record_type, violation, id, ptr) anti-joined against the
    * diff-id set the pointer targets. */
  private def notUpdated(ptrs: DataFrame, targetIds: DataFrame): DataFrame =
    ptrs.join(targetIds, col("ptr") === col("did"), "left_anti")
      .select(col("record_type"), col("violation"), col("id").as("record_id"))

  /** All checkChange violations of one transaction given the old and
    * new store bundles (derives the DiffStore by snapshot join). */
  def violations(oldS: Stores, newS: Stores): DataFrame =
    violationsFromDiffs(TxDiffs(
      nodes = diff(oldS.nodes, newS.nodes,
        Seq("in_use", "next_rel", "next_prop")),
      rels = diff(oldS.rels, newS.rels,
        Seq("type_id", "first_prev", "first_next",
          "second_prev", "second_next", "next_prop")),
      props = diff(oldS.props, newS.props, Seq("prev_prop", "next_prop")),
      neo = diff(oldS.neo, newS.neo, Seq("next_prop"))))

  /** All checkChange violations of one transaction given its
    * DiffStore directly — the scale path: the diff is the (small)
    * input, never a join of two full snapshots. */
  def violationsFromDiffs(d: TxDiffs): DataFrame = {
    // each diff table feeds 2-3 consumers (its own pointer predicates +
    // the anti-join id sets); an eager localCheckpoint materializes the
    // small changed-record set once instead of re-running its
    // derivation per consumer
    val nodeDiff = d.nodes.localCheckpoint(true)
    val relDiff = d.rels.localCheckpoint(true)
    val propDiff = d.props.localCheckpoint(true)
    val neoDiff = d.neo
    val relDiffIds = relDiff.select(col("id").as("did"))
    val propDiffIds = propDiff.select(col("id").as("did"))

    // pointers whose old target must be a REL in the tx: node chain
    // heads + the rel quartet, melted into one anti-join
    val relPtrs = nodeDiff
      .filter(col("o_next_rel") =!= col("n_next_rel") && col("o_next_rel") =!= NIL)
      .select(lit("node").as("record_type"),
        lit("relationship_not_updated").as("violation"),
        col("id"), col("o_next_rel").as("ptr"))
      .unionAll(relDiff.select(col("id"), explode(array(Seq(
        ("source_prev", "first_prev"), ("source_next", "first_next"),
        ("target_prev", "second_prev"), ("target_next", "second_next"))
        .map { case (nm, c) =>
          struct(lit(s"${nm}_not_updated").as("violation"),
            col(s"o_$c").as("ptr"),
            (col(s"o_$c") =!= col(s"n_$c")).as("changed"))
        }: _*)).as("p"))
        .filter(col("p.changed") && col("p.ptr") =!= NIL)
        .select(lit("relationship").as("record_type"),
          col("p.violation").as("violation"), col("id"), col("p.ptr").as("ptr")))

    // pointers whose old target must be a PROP in the tx: owner chain
    // heads (node / rel / neostore) + the prop record's own prev/next
    val propPtrs = nodeDiff
      .filter(col("o_next_prop") =!= col("n_next_prop") && col("o_next_prop") =!= NIL)
      .select(lit("node").as("record_type"),
        lit("property_not_updated").as("violation"),
        col("id"), col("o_next_prop").as("ptr"))
      .unionAll(relDiff
        .filter(col("o_next_prop") =!= col("n_next_prop") && col("o_next_prop") =!= NIL)
        .select(lit("relationship").as("record_type"),
          lit("property_not_updated").as("violation"),
          col("id"), col("o_next_prop").as("ptr")))
      .unionAll(neoDiff
        .filter(col("o_next_prop") =!= col("n_next_prop") && col("o_next_prop") =!= NIL)
        .select(lit("neostore").as("record_type"),
          lit("property_not_updated").as("violation"),
          col("id"), col("o_next_prop").as("ptr")))
      .unionAll(propDiff.select(col("id"), explode(array(Seq(
        ("prev_property", "prev_prop"), ("next_property", "next_prop"))
        .map { case (nm, c) =>
          struct(lit(s"${nm}_not_updated").as("violation"),
            col(s"o_$c").as("ptr"),
            (col(s"o_$c") =!= col(s"n_$c")).as("changed"))
        }: _*)).as("p"))
        .filter(col("p.changed") && col("p.ptr") =!= NIL)
        .select(lit("property").as("record_type"),
          col("p.violation").as("violation"), col("id"), col("p.ptr").as("ptr")))

    notUpdated(relPtrs, relDiffIds).unionAll(notUpdated(propPtrs, propDiffIds))
  }
}
