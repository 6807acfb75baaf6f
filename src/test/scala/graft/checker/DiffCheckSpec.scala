package graft.checker

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.model.RecordStores

/** Incremental diff-check semantics (mirror of the reference's
  * IncrementalCheckIntegrationTest): the corruption tx's dangling
  * back-references are reported, a complete tx is clean, and the
  * streaming (foreachBatch-per-tx) form equals the batch form. */
class DiffCheckSpec extends SparkTestBase {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("corruption tx fires the full NotUpdated family; identical stores produce none") {
    val old = RecordStores.derive(spark, dir)
    val v = DiffCheck.violations(old, Corruption(old))
      .groupBy("record_type", "violation").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // the reference's checkChange family (ConsistencyReport.java:233-266):
    // every pointer kind the corruption touches must report its own
    // NotUpdated predicate
    assert(v.keySet === Set(
      ("node", "relationship_not_updated"),
      ("node", "property_not_updated"),
      ("relationship", "source_prev_not_updated"),
      ("relationship", "source_next_not_updated"),
      ("relationship", "target_prev_not_updated"),
      ("relationship", "target_next_not_updated"),
      ("relationship", "property_not_updated"),
      ("neostore", "property_not_updated"),
      ("property", "prev_property_not_updated"),
      ("property", "next_property_not_updated")))
    assert(v.values.forall(_ > 0))
    // no-op tx: empty diff, no violations
    assert(DiffCheck.violations(old, old).count() === 0L)
  }

  test("scan-built change stream equals the snapshot-join diff (metamorphic)") {
    val old = RecordStores.derive(spark, dir)
    val corrupted = Corruption(old)
    val scan = Corruption.txDiffs(old)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(scan.nodes) === rows(DiffCheck.diff(old.nodes, corrupted.nodes,
      Seq("in_use", "next_rel", "next_prop"))))
    assert(rows(scan.rels) === rows(DiffCheck.diff(old.rels, corrupted.rels,
      Seq("type_id", "first_prev", "first_next",
        "second_prev", "second_next", "next_prop"))))
    assert(rows(scan.props) === rows(DiffCheck.diff(old.props, corrupted.props,
      Seq("prev_prop", "next_prop"))))
    assert(rows(scan.neo) === rows(DiffCheck.diff(old.neo, corrupted.neo,
      Seq("next_prop"))))
    // and the violations computed from the stream equal the join form
    assert(rows(DiffCheck.violationsFromDiffs(scan)) ===
      rows(DiffCheck.violations(old, corrupted)))
  }

  test("a tx that updates both sides of a pointer change is clean") {
    // change node 1's next_rel from 10 to 11 AND include both rels in
    // the tx (their chain pointers changed too) -> no violation
    val oldNodes = Seq((1L, true, 10L, -1L)).toDF("id", "in_use", "next_rel", "next_prop")
    val newNodes = Seq((1L, true, 11L, -1L)).toDF("id", "in_use", "next_rel", "next_prop")
    def rels(rows: (Long, Boolean, Int, Long, Long, Long, Long, Long, Long, Long)*) =
      rows.toDF("id", "in_use", "type_id", "first_node", "second_node",
        "first_prev", "first_next", "second_prev", "second_next", "next_prop")
    val oldRels = rels((10L, true, 0, 1L, 2L, -1L, 11L, -1L, -1L, -1L),
      (11L, true, 0, 1L, 3L, 10L, -1L, -1L, -1L, -1L))
    val newRels = rels((10L, true, 0, 1L, 2L, 11L, -1L, -1L, -1L, -1L),
      (11L, true, 0, 1L, 3L, -1L, 10L, -1L, -1L, -1L))
    val empty = Seq.empty[(Long, Boolean, Long, Long, Long)]
      .toDF("id", "in_use", "owner", "prev_prop", "next_prop")
    val base = RecordStores.derive(spark, dir)
    val oldS = base.copy(nodes = oldNodes, rels = oldRels, props = empty)
    val newS = base.copy(nodes = newNodes, rels = newRels, props = empty)
    assert(DiffCheck.violations(oldS, newS).count() === 0L)
  }

  test("streaming foreachBatch diff check equals the batch form (T2 interceptor)") {
    val old = RecordStores.derive(spark, dir)
    val corrupted = Corruption(old)
    val batch = DiffCheck.violations(old, corrupted)
      .collect().map(_.toSeq).toSet

    // one tx arriving as one micro-batch through a memory stream of
    // node-diff triggers: foreachBatch re-runs the check per tx
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Long]
    stream.addData(1L) // tx id 1
    var got: Set[Seq[Any]] = Set.empty
    val q = stream.toDS().writeStream
      .foreachBatch { (txs: org.apache.spark.sql.Dataset[Long], _: Long) =>
        if (txs.count() > 0) {
          got = DiffCheck.violations(old, corrupted).collect().map(_.toSeq).toSet
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(got === batch)
  }
}
