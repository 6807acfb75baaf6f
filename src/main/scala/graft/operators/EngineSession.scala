package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The embedded read/write graph API surface (SURVEY.md §2.6 G1-G13) —
  * the Spark re-expression of the reference's transactional API as
  * exercised by its HA test corpus
  * (ha/src/test/java/slavetest/CommonJobs.java:47-996).
  *
  * Semantics mapping:
  *  - a transaction (G12, beginTx/success/finish —
  *    CommonJobs.java:56-82) is a buffered batch of mutations applied
  *    atomically to the session state on finish(); writes outside a tx
  *    throw, mirroring NotInTransactionException
  *    (CommonJobs.java:317-330);
  *  - node/rel creation (G1/G2) allocates ids from a session-monotonic
  *    counter — the single-writer analog of master-granted id ranges
  *    (ha/.../IdAllocation.java; C1);
  *  - setProperty/removeProperty (G3) upsert into a per-entity map
  *    (property chains are a storage artifact — the logical model is a
  *    map, SURVEY §1.6);
  *  - delete (G10) enforces the kernel guard: deleting a node that
  *    still has relationships fails the tx;
  *  - the legacy index (G11, index().forNodes) is a (key, value) →
  *    nodeId multimap; putIfAbsent is the uniqueness primitive
  *    (CommonJobs.java:928,964) — serialized per batch under the
  *    single-writer contract (C2 note);
  *  - graph properties (G13) live on entity id 0 by convention
  *    (NeoStoreCheck.java:25, MasterImpl.java:96).
  *
  * State is driver-held maps mirrored to DataFrames on demand: the
  * OLTP surface of the reference is point writes, which Spark
  * represents as batch MERGEs — each finish() is one logical MERGE
  * batch. At cluster scale the DataFrames write as Delta-style
  * upserts; here [[nodesDF]]/[[relsDF]] materialize the state for the
  * analytical operators to consume.
  */
final class EngineSession(spark: SparkSession) {
  import EngineSession._

  private var nextId = 1L
  private val nodes = mutable.LinkedHashMap[Long, mutable.LinkedHashMap[String, String]]()
  private val rels = mutable.LinkedHashMap[Long, RelRow]()
  private val indexes = mutable.LinkedHashMap[(String, String, String), mutable.LinkedHashSet[Long]]()
  private val graphProps = mutable.LinkedHashMap[String, String]()
  private var activeTx: Option[Tx] = None

  /** G8: the reference node (id 0) exists from the start. */
  nodes(0L) = mutable.LinkedHashMap.empty

  def beginTx(): Tx = synchronized {
    require(activeTx.isEmpty, "nested transactions are not supported (single-writer)")
    val tx = new Tx(this)
    activeTx = Some(tx)
    tx
  }

  private[operators] def requireTx(tx: Tx): Unit =
    require(activeTx.contains(tx) && !tx.finished,
      "not in transaction") // NotInTransactionException analog

  private[operators] def allocate(): Long = { val id = nextId; nextId += 1; id }

  private[operators] def commit(tx: Tx): Unit = synchronized {
    try commitValidated(tx)
    finally activeTx = None // a failed commit must not wedge the session
  }

  /** Validation strictly precedes mutation so an aborting batch leaves
    * the graph untouched (batch atomicity — the tx contract of G12). */
  private def commitValidated(tx: Tx): Unit = {
    // sequential shadow of live ids: catches ops against entities that
    // are missing, or deleted earlier in the same batch
    val live = mutable.Set[Long](nodes.keysIterator.toSeq: _*)
    val liveRels = mutable.Set[Long](rels.keysIterator.toSeq: _*)
    tx.ops.foreach {
      case CreateNode(id) => live += id
      case CreateRel(id, src, dst, _) =>
        require(live(src) && live(dst), "endpoint missing")
        liveRels += id
      case SetNodeProp(id, _, _) => require(live(id), s"node $id not found")
      case SetRelProp(id, _, _) => require(liveRels(id), s"rel $id not found")
      case DeleteNode(id) => live -= id
      case DeleteRel(id) => liveRels -= id
      case _ => ()
    }
    // referential guard: node deletes with surviving rels abort the batch
    val deletedNodes = tx.ops.collect { case DeleteNode(id) => id }.toSet
    val survivingRels = (rels.keySet -- tx.ops.collect { case DeleteRel(id) => id }) ++
      tx.ops.collect { case CreateRel(id, _, _, _) => id }
    val createdRels = tx.ops.collect { case cr: CreateRel => cr.id -> cr }.toMap
    deletedNodes.foreach { n =>
      val attached = survivingRels.exists { rid =>
        val r = createdRels.get(rid).map(cr => RelRow(cr.src, cr.dst, cr.typ, mutable.LinkedHashMap.empty))
          .orElse(rels.get(rid))
        r.exists(rr => rr.src == n || rr.dst == n)
      }
      require(!attached, s"node $n still has relationships")
    }
    tx.ops.foreach {
      case CreateNode(id) => nodes(id) = mutable.LinkedHashMap.empty
      case CreateRel(id, src, dst, typ) =>
        require(nodes.contains(src) && nodes.contains(dst), "endpoint missing")
        rels(id) = RelRow(src, dst, typ, mutable.LinkedHashMap.empty)
      case SetNodeProp(id, k, v) => nodes(id)(k) = v
      case RemoveNodeProp(id, k) => nodes.get(id).foreach(_.remove(k))
      case SetRelProp(id, k, v) => rels(id).props(k) = v
      case SetGraphProp(k, v) => graphProps(k) = v
      case DeleteNode(id) => nodes.remove(id)
      case DeleteRel(id) => rels.remove(id)
      case IndexAdd(name, k, v, id) =>
        indexes.getOrElseUpdate((name, k, v), mutable.LinkedHashSet.empty) += id
    }
  }

  private[operators] def rollback(tx: Tx): Unit = synchronized { activeTx = None }

  // ---- reads (G4-G9, G11, G13) — allowed outside tx like the
  // reference's read side on slaves ----
  def nodeById(id: Long): Map[String, String] =
    nodes.getOrElse(id, throw new NoSuchElementException(s"node $id")).toMap
  def hasNode(id: Long): Boolean = nodes.contains(id)
  def relationships(nodeId: Long, types: Set[String] = Set.empty,
                    direction: String = "BOTH"): Seq[(Long, RelRow)] =
    rels.toSeq.filter { case (_, r) =>
      (types.isEmpty || types(r.typ)) && (direction match {
        case "OUTGOING" => r.src == nodeId
        case "INCOMING" => r.dst == nodeId
        case _ => r.src == nodeId || r.dst == nodeId
      })
    }
  def getOtherNode(relId: Long, nodeId: Long): Long = {
    val r = rels(relId)
    if (r.src == nodeId) r.dst else r.src
  }
  def allNodeIds: Seq[Long] = nodes.keys.toSeq
  def indexGet(name: String, k: String, v: String): Seq[Long] =
    indexes.get((name, k, v)).map(_.toSeq).getOrElse(Seq.empty)
  def graphProperty(k: String): Option[String] = graphProps.get(k)

  /** putIfAbsent (G11): returns the existing id if present, else adds —
    * atomic under the single-writer-per-batch contract. */
  def putIfAbsent(name: String, k: String, v: String, id: Long): Long = synchronized {
    val key = (name, k, v)
    indexes.get(key).flatMap(_.headOption) match {
      case Some(existing) => existing
      case None =>
        indexes.getOrElseUpdate(key, mutable.LinkedHashSet.empty) += id
        id
    }
  }

  // ---- materialization to DataFrames (the analytical bridge) ----
  def nodesDF: DataFrame = {
    import spark.implicits._
    nodes.toSeq.map { case (id, ps) => (id, ps.toMap) }.toDF("id", "props")
  }
  def relsDF: DataFrame = {
    import spark.implicits._
    rels.toSeq.map { case (id, r) => (id, r.src, r.dst, r.typ, r.props.toMap) }
      .toDF("id", "src", "dst", "type", "props")
  }

  /** whole-graph snapshot for the replica-equality oracle
    * (AbstractHaTest.verify:159-208) */
  def snapshot: GraphSnapshot = GraphSnapshot(
    nodes.map { case (id, ps) => id -> ps.toMap }.toMap,
    rels.map { case (id, r) => id -> (r.src, r.dst, r.typ, r.props.toMap) }.toMap,
    indexes.map { case (k, ids) => k -> ids.toSet }.toMap,
    graphProps.toMap)
}

object EngineSession {
  final case class RelRow(src: Long, dst: Long, typ: String,
                          props: mutable.LinkedHashMap[String, String])
  final case class GraphSnapshot(
    nodes: Map[Long, Map[String, String]],
    rels: Map[Long, (Long, Long, String, Map[String, String])],
    indexes: Map[(String, String, String), Set[Long]],
    graphProps: Map[String, String])

  sealed trait Op
  final case class CreateNode(id: Long) extends Op
  final case class CreateRel(id: Long, src: Long, dst: Long, typ: String) extends Op
  final case class SetNodeProp(id: Long, k: String, v: String) extends Op
  final case class RemoveNodeProp(id: Long, k: String) extends Op
  final case class SetRelProp(id: Long, k: String, v: String) extends Op
  final case class SetGraphProp(k: String, v: String) extends Op
  final case class DeleteNode(id: Long) extends Op
  final case class DeleteRel(id: Long) extends Op
  final case class IndexAdd(name: String, k: String, v: String, id: Long) extends Op

  /** Transaction handle (G12): buffers ops; success()+finish() applies
    * atomically, finish() without success() rolls back — mirroring the
    * reference's tx.success/tx.finish protocol. */
  final class Tx(session: EngineSession) {
    private[operators] val ops = mutable.ArrayBuffer[Op]()
    private var succeeded = false
    private[operators] var finished = false

    def createNode(): Long = {
      session.requireTx(this)
      val id = session.allocate(); ops += CreateNode(id); id
    }
    def createRelationship(src: Long, dst: Long, typ: String): Long = {
      session.requireTx(this)
      val id = session.allocate(); ops += CreateRel(id, src, dst, typ); id
    }
    def setProperty(id: Long, k: String, v: String): Unit = {
      session.requireTx(this); ops += SetNodeProp(id, k, v)
    }
    def removeProperty(id: Long, k: String): Unit = {
      session.requireTx(this); ops += RemoveNodeProp(id, k)
    }
    def setRelProperty(id: Long, k: String, v: String): Unit = {
      session.requireTx(this); ops += SetRelProp(id, k, v)
    }
    def setGraphProperty(k: String, v: String): Unit = {
      session.requireTx(this); ops += SetGraphProp(k, v)
    }
    def delete(id: Long): Unit = { session.requireTx(this); ops += DeleteNode(id) }
    def deleteRelationship(id: Long): Unit = {
      session.requireTx(this); ops += DeleteRel(id)
    }
    def indexAdd(name: String, k: String, v: String, id: Long): Unit = {
      session.requireTx(this); ops += IndexAdd(name, k, v, id)
    }
    def success(): Unit = { succeeded = true }
    def finish(): Unit = {
      session.requireTx(this)
      finished = true
      if (succeeded) session.commit(this) else session.rollback(this)
    }
  }
}
