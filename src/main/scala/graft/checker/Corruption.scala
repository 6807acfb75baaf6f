package graft.checker

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Stores

/** Deterministic corruption injection over consistent record stores —
  * the Spark twin of the reference's corruption-injecting test fixture
  * (consistency-check/.../FullCheckIntegrationTest.java:280-351 applies
  * surgical record edits inside GraphStoreFixture.apply; here each edit
  * is a modulo-selected column rewrite so the exact same corruption is
  * reproducible in the DuckDB oracle).
  *
  * Each rule targets one checker dimension (SURVEY.md §2.3 J-numbers):
  *
  *  - nodes: dangling next_rel (J1), in_use=false while still referenced
  *    (J3), next_prop stolen from the neighbouring entity (J5/J13/J15)
  *  - rels: type id outside the dictionary (J2), broken chain pointers
  *    on all four sides (J4 + the incremental NotUpdated family),
  *    next_prop stolen from the neighbouring rel (J5-rel/J13/J15)
  *  - neo: the graph-property chain head redirected to a nonexistent
  *    record (J5-neostore + neostore property_not_updated)
  *  - props: broken prev_prop and next_prop pointers (J6, J12 prev/next)
  *  - blocks: long-string and array value_ref shifted onto the next
  *    owner's chain (J8/J14/J15 per dynamic store)
  *  - dyns: self-referencing next_block (J9), zero length (P3)
  *  - arrays: same two rules in the array store's own id space
  *  - typeNames: one zero-length name block (J10)
  *
  * Moduli are primes so rules overlap rarely but deterministically.
  *
  * Rules are DATA (condition + replacement per column), consumed two
  * ways: [[apply]] rewrites whole stores (the corrupted world the full
  * check scans), and [[txDiffs]] emits the same corruption as a
  * CHANGE STREAM — (old, new) pairs of exactly the touched records, in
  * one filtered scan per store. The incremental checker consumes the
  * latter: at 100 TB a tx diff arrives from the log/CDC source as a
  * small changed-row set, and joining two full store snapshots just to
  * rediscover it (the r2 shape) is the anti-pattern.
  */
object Corruption {
  private final case class Rule(column: String, cond: Column, value: Column)

  private def nodeRules = Seq(
    Rule("next_rel", col("id") % 101 === 3 && col("next_rel") =!= -1,
      col("next_rel") + 1000000),
    Rule("in_use", col("id") % 107 === 9, lit(false)),
    Rule("next_prop", col("id") % 113 === 11, (col("id") + 1) * 4))

  private def relRules = Seq(
    Rule("type_id", col("id") % 103 === 5, lit(77)),
    Rule("first_next", col("id") % 109 === 7 && col("first_next") =!= -1,
      col("first_next") + 1000000),
    Rule("first_prev", col("id") % 181 === 37 && col("first_prev") =!= -1,
      col("first_prev") + 1000000),
    Rule("second_prev", col("id") % 191 === 43 && col("second_prev") =!= -1,
      col("second_prev") + 1000000),
    Rule("second_next", col("id") % 139 === 23 && col("second_next") =!= -1,
      col("second_next") + 1000000),
    Rule("next_prop", col("id") % 151 === 29, (col("id") + 1) * 4))

  private def neoRules = Seq(
    Rule("next_prop", lit(true), lit(4L)))

  private def propRules = Seq(
    Rule("prev_prop", col("id") % 131 === 17 && col("prev_prop") =!= -1,
      col("prev_prop") + 5000000),
    Rule("next_prop", col("id") % 157 === 31 && col("next_prop") =!= -1,
      col("next_prop") + 5000000))

  private def blockRules = Seq(
    Rule("value_ref", expr("(prop_id div 4) % 149") === 31
      && col("ptype") === 4 && col("key_id") === 0, col("value_ref") + 128),
    Rule("value_ref", expr("(prop_id div 4) % 163") === 41
      && col("ptype") === 5, col("value_ref") + 128),
    // junk type code on inlined-long blocks (P3 invalid_property_value;
    // targets ptype=1 so no string/array-family check changes footing).
    // Listed AFTER the value_ref rules: rewrite() rewrites columns in
    // rule order, so value_ref conditions read the ORIGINAL ptype —
    // same simultaneous-read semantics as the oracle's single SELECT.
    Rule("ptype", expr("(prop_id div 4) % 179") === 53 && col("ptype") === 1,
      lit(99)))

  private def dynRules = Seq(
    Rule("next_block", col("id") % 127 === 13 && col("next_block") =!= -1,
      col("id")),
    Rule("length", col("id") % 137 === 19, lit(0L)))

  private def arrayRules = Seq(
    Rule("next_block", col("id") % 167 === 13 && col("next_block") =!= -1,
      col("id")),
    Rule("length", col("id") % 173 === 19, lit(0L)))

  private def typeNameRules = Seq(
    Rule("length", col("id") === 16, lit(0L)))

  /** The new value of one column under the store's rules (conditions
    * are mutually exclusive per column by the prime moduli, so the
    * CASE fold equals sequential withColumn application). */
  private def newValue(c: String, rules: Seq[Rule]): Column =
    rules.filter(_.column == c)
      .foldLeft(col(c))((acc, r) => when(r.cond, r.value).otherwise(acc))

  private def rewrite(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.map(_.column).distinct
      .foldLeft(df)((d, c) => d.withColumn(c, newValue(c, rules)))

  def apply(s: Stores): Stores = s.copy(
    nodes = rewrite(s.nodes, nodeRules),
    rels = rewrite(s.rels, relRules),
    neo = rewrite(s.neo, neoRules),
    props = rewrite(s.props, propRules),
    blocks = rewrite(s.blocks, blockRules),
    dyns = rewrite(s.dyns, dynRules),
    arrays = rewrite(s.arrays, arrayRules),
    typeNames = rewrite(s.typeNames, typeNameRules))

  /** One store's slice of the corruption transaction as a change
    * stream: (id, o_c, n_c per watched column) for exactly the touched
    * rows — a single filtered scan, no old⋈new join. */
  private def scanDiff(df: DataFrame, rules: Seq[Rule],
      watched: Seq[String]): DataFrame =
    df.filter(rules.map(_.cond).reduce(_ || _))
      .select(col("id") +:
        (watched.map(c => col(c).as(s"o_$c")) ++
          watched.map(c => newValue(c, rules).as(s"n_$c"))): _*)
      .filter(watched.map(c => col(s"o_$c") =!= col(s"n_$c")).reduce(_ || _))

  /** The corruption tx's DiffStore — same schema the generic
    * [[DiffCheck.diff]] produces, derived without joining snapshots.
    * Only the four property-owning / pointer-carrying stores
    * participate in checkChange predicates. */
  def txDiffs(s: Stores): DiffCheck.TxDiffs = DiffCheck.TxDiffs(
    nodes = scanDiff(s.nodes, nodeRules,
      Seq("in_use", "next_rel", "next_prop")),
    rels = scanDiff(s.rels, relRules,
      Seq("type_id", "first_prev", "first_next",
        "second_prev", "second_next", "next_prop")),
    props = scanDiff(s.props, propRules, Seq("prev_prop", "next_prop")),
    neo = scanDiff(s.neo, neoRules, Seq("next_prop")))
}
