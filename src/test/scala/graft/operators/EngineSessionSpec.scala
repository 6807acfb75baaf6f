package graft.operators

import graft.SparkTestBase

/** Replica-equality oracle for the write API (mirror of the reference's
  * AbstractHaTest.verify:159-208: apply a workload, deep-compare the
  * whole graph against an independently maintained model) plus the tx
  * protocol edge cases from CommonJobs. */
class EngineSessionSpec extends SparkTestBase {

  private def newSession = new EngineSession(spark)

  test("workload replica-equality against an independent model") {
    val s = newSession
    // independent naive model
    var modelNodes = Map[Long, Map[String, String]](0L -> Map.empty)
    var modelRels = Map[Long, (Long, Long, String)]()

    val tx1 = s.beginTx()
    val a = tx1.createNode(); val b = tx1.createNode(); val c = tx1.createNode()
    val r1 = tx1.createRelationship(a, b, "KNOWS")
    val r2 = tx1.createRelationship(b, c, "KNOWS")
    val r3 = tx1.createRelationship(0L, a, "ROOT")
    tx1.setProperty(a, "name", "alice")
    tx1.setProperty(b, "name", "bob")
    tx1.setProperty(b, "age", "33")
    tx1.success(); tx1.finish()
    modelNodes ++= Seq(a -> Map("name" -> "alice"),
      b -> Map("name" -> "bob", "age" -> "33"), c -> Map.empty)
    modelRels ++= Seq(r1 -> (a, b, "KNOWS"), r2 -> (b, c, "KNOWS"), r3 -> (0L, a, "ROOT"))

    val tx2 = s.beginTx()
    tx2.removeProperty(b, "age")
    tx2.setProperty(c, "name", "carol")
    tx2.deleteRelationship(r2)
    tx2.success(); tx2.finish()
    modelNodes = modelNodes.updated(b, Map("name" -> "bob"))
      .updated(c, Map("name" -> "carol"))
    modelRels -= r2

    val snap = s.snapshot
    assert(snap.nodes === modelNodes)
    assert(snap.rels.view.mapValues(t => (t._1, t._2, t._3)).toMap === modelRels)
    // DataFrame materialization agrees with the model
    assert(s.nodesDF.count() === modelNodes.size.toLong)
    assert(s.relsDF.count() === modelRels.size.toLong)
  }

  test("writes outside a transaction throw (NotInTransaction analog)") {
    val s = newSession
    val tx = s.beginTx()
    val n = tx.createNode()
    tx.success(); tx.finish()
    intercept[IllegalArgumentException] { tx.setProperty(n, "k", "v") }
  }

  test("finish without success rolls the batch back") {
    val s = newSession
    val tx = s.beginTx()
    val n = tx.createNode()
    tx.finish() // no success()
    assert(!s.hasNode(n))
  }

  test("deleting a node that still has relationships aborts the batch") {
    val s = newSession
    val tx = s.beginTx()
    val a = tx.createNode(); val b = tx.createNode()
    tx.createRelationship(a, b, "KNOWS")
    tx.success(); tx.finish()
    val tx2 = s.beginTx()
    tx2.delete(a)
    tx2.success()
    intercept[IllegalArgumentException] { tx2.finish() }
  }

  test("delete succeeds when the rel is deleted in the same batch") {
    val s = newSession
    val tx = s.beginTx()
    val a = tx.createNode(); val b = tx.createNode()
    val r = tx.createRelationship(a, b, "KNOWS")
    tx.success(); tx.finish()
    val tx2 = s.beginTx()
    tx2.deleteRelationship(r)
    tx2.delete(a)
    tx2.success(); tx2.finish()
    assert(!s.hasNode(a) && s.hasNode(b))
  }

  test("putIfAbsent is a uniqueness constraint") {
    val s = newSession
    val tx = s.beginTx()
    val a = tx.createNode(); val b = tx.createNode()
    tx.success(); tx.finish()
    assert(s.putIfAbsent("people", "email", "x@y", a) === a)
    assert(s.putIfAbsent("people", "email", "x@y", b) === a) // loser gets winner's id
    assert(s.indexGet("people", "email", "x@y") === Seq(a))
  }

  test("expand by type and direction matches the reference semantics") {
    val s = newSession
    val tx = s.beginTx()
    val a = tx.createNode(); val b = tx.createNode(); val c = tx.createNode()
    tx.createRelationship(a, b, "X"); tx.createRelationship(c, a, "X")
    tx.createRelationship(a, b, "Y")
    tx.success(); tx.finish()
    assert(s.relationships(a, Set("X"), "OUTGOING").size === 1)
    assert(s.relationships(a, Set("X"), "INCOMING").size === 1)
    assert(s.relationships(a, Set("X", "Y"), "BOTH").size === 3)
    assert(s.getOtherNode(s.relationships(a, Set("Y")).head._1, a) === b)
  }
}
