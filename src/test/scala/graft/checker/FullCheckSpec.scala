package graft.checker

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase
import graft.model.Stores

/** Per-check unit tests with hand-built record rows — the Spark twin of
  * the reference's RecordCheckTestBase pattern
  * (consistency-check/src/test/.../RecordCheckTestBase.java:45-300):
  * build a tiny store fixture, run one check, assert exactly which
  * violations fire. */
class FullCheckSpec extends SparkTestBase {
  import spark.implicits._

  private def nodes(rows: (Long, Boolean, Long, Long)*): DataFrame =
    rows.toDF("id", "in_use", "next_rel", "next_prop")
  private def rels(rows: (Long, Boolean, Int, Long, Long, Long, Long, Long, Long, Long)*): DataFrame =
    rows.toDF("id", "in_use", "type_id", "first_node", "second_node",
      "first_prev", "first_next", "second_prev", "second_next", "next_prop")
  private def props(rows: (Long, Boolean, Long, Long, Long)*): DataFrame =
    rows.toDF("id", "in_use", "owner", "prev_prop", "next_prop")
  private def blocks(rows: (Long, Int, Int, Int, Long, Long)*): DataFrame =
    rows.toDF("prop_id", "idx", "key_id", "ptype", "value_ref", "vlen")
  private def dyns(rows: (Long, Boolean, Long, Long)*): DataFrame =
    rows.toDF("id", "in_use", "length", "next_block")
  private def dims(rows: (Long, Boolean, Long)*): DataFrame =
    rows.toDF("id", "in_use", "name_id")

  private def neo(rows: (Long, Boolean, Long)*): DataFrame =
    rows.toDF("id", "in_use", "next_prop")

  /** Minimal consistent fixture: two nodes, one typed rel (with its own
    * property chain), the NeoStore record (graph property), one
    * string-overflow property, one array property — mirrors
    * FullCheckIntegrationTest.java:58-73 extended to every owner kind
    * (PrimitiveRecordCheck.java:34, NeoStoreCheck.java:25) and both
    * dynamic stores (RecordType.java:22-28). */
  private def fixture: Stores = Stores(
    nodes = nodes((1L, true, 10L, 4L), (2L, true, 10L, 8L)),
    rels = rels((10L, true, 0, 1L, 2L, -1L, -1L, -1L, -1L, 40L)),
    neo = neo((0L, true, 0L)),
    props = props((0L, true, 0L, -1L, -1L), (4L, true, 1L, -1L, -1L),
      (8L, true, 2L, -1L, -1L), (40L, true, 10L, -1L, -1L)),
    blocks = blocks((0L, 0, 0, 1, -1L, 0L), (4L, 0, 0, 3, -1L, 4L),
      (4L, 1, 0, 5, 200L, 24L), (8L, 0, 0, 4, 100L, 20L),
      (40L, 0, 0, 1, -1L, 0L)),
    dyns = dyns((100L, true, 16L, 101L), (101L, true, 4L, -1L)),
    arrays = dyns((200L, true, 16L, 201L), (201L, true, 8L, -1L)),
    relTypes = dims((0L, true, 0L)),
    propKeys = dims((0L, true, 0L)),
    typeNames = dyns((0L, true, 9L, -1L)),
    keyNames = dyns((0L, true, 4L, -1L)))

  private def viols(s: Stores): Set[(String, String, Long)] =
    FullCheck.violations(s).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("consistent fixture produces zero violations") {
    assert(viols(fixture) === Set.empty)
  }

  test("J1: dangling node.next_rel -> relationship_not_in_use") {
    val s = fixture.copy(nodes = nodes((1L, true, 99L, 4L), (2L, true, 10L, 8L)))
    assert(viols(s).contains(("node", "relationship_not_in_use", 1L)))
  }

  test("J1: next_rel to a rel of other nodes -> relationship_for_other_node") {
    val s = fixture.copy(
      nodes = nodes((1L, true, 10L, 4L), (2L, true, 10L, 8L), (3L, true, 10L, -1L)))
    assert(viols(s).contains(("node", "relationship_for_other_node", 3L)))
  }

  test("J2: type id outside dictionary -> label_not_in_use") {
    val s = fixture.copy(rels = rels((10L, true, 9, 1L, 2L, -1L, -1L, -1L, -1L, -1L)))
    assert(viols(s).contains(("relationship", "label_not_in_use", 10L)))
  }

  test("J3: endpoint node not in use -> source_node_not_in_use") {
    val s = fixture.copy(nodes = nodes((1L, false, 10L, 4L), (2L, true, 10L, 8L)))
    val v = viols(s)
    assert(v.contains(("relationship", "source_node_not_in_use", 10L)))
  }

  test("J3: chain head not referenced back -> source_node_does_not_reference_back") {
    val s = fixture.copy(nodes = nodes((1L, true, -1L, 4L), (2L, true, 10L, 8L)))
    assert(viols(s).contains(("relationship", "source_node_has_no_relationships", 10L)))
  }

  test("J4: broken chain reciprocity -> source_next_does_not_reference_back") {
    // two rels on node 1's chain: 10 -> next 11, but 11's prev on node 1 is 99
    val s = fixture.copy(
      nodes = nodes((1L, true, 10L, 4L), (2L, true, 10L, 8L), (3L, true, 11L, -1L)),
      rels = rels(
        (10L, true, 0, 1L, 2L, -1L, 11L, -1L, -1L, -1L),
        (11L, true, 0, 1L, 3L, 99L, -1L, -1L, -1L, -1L)))
    val v = viols(s)
    assert(v.contains(("relationship", "source_next_does_not_reference_back", 10L)))
    // and 11's dangling prev pointer fires its own check
    assert(v.contains(("relationship", "source_prev_not_in_use", 11L)))
  }

  test("J5: node property head not first in chain") {
    val s = fixture.copy(props = props((4L, true, 1L, 77L, -1L), (8L, true, 2L, -1L, -1L)))
    assert(viols(s).contains(("node", "property_not_first_in_chain", 1L)))
  }

  test("J8: long-string block with dangling value_ref -> string_not_in_use") {
    val s = fixture.copy(dyns = dyns((101L, true, 4L, -1L)))
    assert(viols(s).contains(("property", "string_not_in_use", 8L)))
  }

  test("J9: dynamic self reference and invalid length") {
    val s = fixture.copy(dyns = dyns((100L, true, 16L, 100L), (101L, true, 0L, -1L)))
    val v = viols(s)
    assert(v.contains(("string", "self_reference", 100L)))
    assert(v.contains(("string", "invalid_length", 101L)))
  }

  test("J13/J15: duplicate owner and orphaned chain") {
    // node 2 claims node 1's chain head (4); node 2's own head (8) orphaned
    val s = fixture.copy(nodes = nodes((1L, true, 10L, 4L), (2L, true, 10L, 4L)))
    val v = viols(s)
    assert(v.contains(("property", "multiple_owners", 4L)))
    assert(v.contains(("property", "orphan_chain", 8L)))
  }

  test("J10: zero-length dictionary name -> empty_name") {
    val s = fixture.copy(typeNames = dyns((0L, true, 0L, -1L)))
    val v = viols(s)
    assert(v.contains(("label", "empty_name", 0L)))
    assert(v.contains(("label_name", "invalid_length", 0L)))
  }

  test("J5-rel: dangling relationship property head -> property_not_in_use") {
    val s = fixture.copy(rels = rels((10L, true, 0, 1L, 2L, -1L, -1L, -1L, -1L, 99L)))
    val v = viols(s)
    assert(v.contains(("relationship", "property_not_in_use", 10L)))
    // the rel's real chain head is now unclaimed
    assert(v.contains(("property", "orphan_chain", 40L)))
  }

  test("J5-neostore: dangling graph property head -> property_not_in_use") {
    val s = fixture.copy(neo = neo((0L, true, 99L)))
    val v = viols(s)
    assert(v.contains(("neostore", "property_not_in_use", 0L)))
    assert(v.contains(("property", "orphan_chain", 0L)))
  }

  test("J13 across owner kinds: rel claiming a node's chain head") {
    val s = fixture.copy(rels = rels((10L, true, 0, 1L, 2L, -1L, -1L, -1L, -1L, 4L)))
    val v = viols(s)
    assert(v.contains(("property", "multiple_owners", 4L)))
    assert(v.contains(("property", "orphan_chain", 40L)))
  }

  test("J8-array: dangling array value_ref -> array_not_in_use") {
    val s = fixture.copy(arrays = dyns((201L, true, 8L, -1L)))
    val v = viols(s)
    assert(v.contains(("property", "array_not_in_use", 4L)))
    // head 200 gone; 201 is mid-chain (not id%8==0) so no array orphan
    assert(!v.contains(("array", "orphan_chain", 201L)))
  }

  test("J9/J14/J15-array: self reference, duplicate owners, orphan chain") {
    val s = fixture.copy(
      blocks = blocks((0L, 0, 0, 1, -1L, 0L), (4L, 0, 0, 3, -1L, 4L),
        (4L, 1, 0, 5, 208L, 24L), (8L, 0, 0, 4, 100L, 20L),
        (8L, 1, 0, 5, 208L, 8L), (40L, 0, 0, 1, -1L, 0L)),
      arrays = dyns((200L, true, 16L, 200L), (208L, true, 8L, -1L)))
    val v = viols(s)
    assert(v.contains(("array", "self_reference", 200L)))
    assert(v.contains(("array", "multiple_owners", 208L)))
    assert(v.contains(("array", "orphan_chain", 200L)))
  }
}
