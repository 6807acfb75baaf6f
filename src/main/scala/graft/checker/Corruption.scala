package graft.checker

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
  */
object Corruption {
  def apply(s: Stores): Stores = s.copy(
    nodes = s.nodes
      .withColumn("next_rel",
        when(col("id") % 101 === 3 && col("next_rel") =!= -1,
          col("next_rel") + 1000000).otherwise(col("next_rel")))
      .withColumn("in_use",
        when(col("id") % 107 === 9, lit(false)).otherwise(col("in_use")))
      .withColumn("next_prop",
        when(col("id") % 113 === 11, (col("id") + 1) * 4)
          .otherwise(col("next_prop"))),
    rels = s.rels
      .withColumn("type_id",
        when(col("id") % 103 === 5, lit(77)).otherwise(col("type_id")))
      .withColumn("first_next",
        when(col("id") % 109 === 7 && col("first_next") =!= -1,
          col("first_next") + 1000000).otherwise(col("first_next")))
      .withColumn("first_prev",
        when(col("id") % 181 === 37 && col("first_prev") =!= -1,
          col("first_prev") + 1000000).otherwise(col("first_prev")))
      .withColumn("second_prev",
        when(col("id") % 191 === 43 && col("second_prev") =!= -1,
          col("second_prev") + 1000000).otherwise(col("second_prev")))
      .withColumn("second_next",
        when(col("id") % 139 === 23 && col("second_next") =!= -1,
          col("second_next") + 1000000).otherwise(col("second_next")))
      .withColumn("next_prop",
        when(col("id") % 151 === 29, (col("id") + 1) * 4)
          .otherwise(col("next_prop"))),
    neo = s.neo
      .withColumn("next_prop", lit(4L)),
    props = s.props
      .withColumn("prev_prop",
        when(col("id") % 131 === 17 && col("prev_prop") =!= -1,
          col("prev_prop") + 5000000).otherwise(col("prev_prop")))
      .withColumn("next_prop",
        when(col("id") % 157 === 31 && col("next_prop") =!= -1,
          col("next_prop") + 5000000).otherwise(col("next_prop"))),
    blocks = s.blocks
      .withColumn("value_ref",
        when(expr("(prop_id div 4) % 149") === 31 && col("ptype") === 4
             && col("key_id") === 0,
          col("value_ref") + 128)
        .when(expr("(prop_id div 4) % 163") === 41 && col("ptype") === 5,
          col("value_ref") + 128)
        .otherwise(col("value_ref"))),
    dyns = s.dyns
      .withColumn("next_block",
        when(col("id") % 127 === 13 && col("next_block") =!= -1,
          col("id")).otherwise(col("next_block")))
      .withColumn("length",
        when(col("id") % 137 === 19, lit(0L)).otherwise(col("length"))),
    arrays = s.arrays
      .withColumn("next_block",
        when(col("id") % 167 === 13 && col("next_block") =!= -1,
          col("id")).otherwise(col("next_block")))
      .withColumn("length",
        when(col("id") % 173 === 19, lit(0L)).otherwise(col("length"))),
    typeNames = s.typeNames
      .withColumn("length",
        when(col("id") === 16, lit(0L)).otherwise(col("length")))
  )
}
