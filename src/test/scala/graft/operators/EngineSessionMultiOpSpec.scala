package graft.operators

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Multi-op-per-transaction randomized oracle: where
  * [[EngineSessionPropSpec]] interleaves commit/abort one op at a time,
  * this drives BATCHES of 1-4 ops per tx, so validation must reason
  * about in-batch ordering (a rel to a node created earlier in the
  * same tx is legal; a property set on a node created later is not;
  * a node delete aborts if any rel — pre-existing or created in-batch
  * — survives the batch). The model re-implements the documented
  * sequential-shadow validation + atomic apply, and the session must
  * agree with it on every commit/abort decision and on final state. */
class EngineSessionMultiOpSpec extends SparkTestBase {

  sealed trait MOp
  case class MCreateNode(idx: Int) extends MOp // idx names the id later
  case class MCreateRel(srcIdx: Int, dstIdx: Int, typ: String) extends MOp
  case class MSetProp(idx: Int, k: String, v: String) extends MOp
  case class MRemoveProp(idx: Int, k: String) extends MOp
  case class MDelNode(idx: Int) extends MOp
  case class MDelRel(idx: Int) extends MOp

  private val genOp: Gen[MOp] = Gen.frequency(
    4 -> Gen.const(MCreateNode(0)),
    4 -> (for { s <- Gen.choose(0, 40); d <- Gen.choose(0, 40);
                t <- Gen.oneOf("A", "B") } yield MCreateRel(s, d, t)),
    3 -> (for { i <- Gen.choose(0, 40); k <- Gen.oneOf("k1", "k2");
                v <- Gen.alphaStr.map(_.take(4)) } yield MSetProp(i, k, v)),
    1 -> (for { i <- Gen.choose(0, 40); k <- Gen.oneOf("k1", "k2") } yield MRemoveProp(i, k)),
    2 -> Gen.choose(0, 40).map(MDelNode),
    2 -> Gen.choose(0, 40).map(MDelRel))

  private val genTx: Gen[List[MOp]] = Gen.choose(1, 4).flatMap(Gen.listOfN(_, genOp))

  // resolved ops over concrete ids
  sealed trait ROp
  case class RCreateNode(id: Long) extends ROp
  case class RCreateRel(id: Long, src: Long, dst: Long, typ: String) extends ROp
  case class RSetProp(id: Long, k: String, v: String) extends ROp
  case class RRemoveProp(id: Long, k: String) extends ROp
  case class RDelNode(id: Long) extends ROp
  case class RDelRel(id: Long) extends ROp

  /** the session's documented commit contract, over plain maps */
  private def validates(ops: Seq[ROp], nodeIds: Set[Long],
      relsM: Map[Long, (Long, Long, String)]): Boolean = {
    val live = mutable.Set[Long](nodeIds.toSeq: _*)
    val liveRels = mutable.Set[Long](relsM.keys.toSeq: _*)
    val seqOk = ops.forall {
      case RCreateNode(id) => live += id; true
      case RCreateRel(id, s, d, _) =>
        val ok = live(s) && live(d); liveRels += id; ok
      case RSetProp(id, _, _) => live(id)
      case RRemoveProp(_, _) => true
      case RDelNode(id) => live -= id; true
      case RDelRel(id) => liveRels -= id; true
    }
    seqOk && {
      val deleted = ops.collect { case RDelNode(id) => id }.toSet
      val surviving = (relsM.keySet -- ops.collect { case RDelRel(id) => id }) ++
        ops.collect { case RCreateRel(id, _, _, _) => id }
      val created = ops.collect { case c: RCreateRel => c.id -> c }.toMap
      deleted.forall { n =>
        !surviving.exists { rid =>
          created.get(rid).map(c => (c.src, c.dst))
            .orElse(relsM.get(rid).map(r => (r._1, r._2)))
            .exists(p => p._1 == n || p._2 == n)
        }
      }
    }
  }

  test("multi-op transactions: session agrees with the model on every batch") {
    val prop = Prop.forAll(Gen.listOfN(20, genTx)) { txs =>
      val s = new EngineSession(spark)
      var nodes = Map[Long, Map[String, String]](0L -> Map.empty)
      var rels = Map[Long, (Long, Long, String)]()
      var pool = Vector[Long](0L) // every allocated node id, live or not
      var relPool = Vector[Long]()
      txs.foreach { txOps =>
        val tx = s.beginTx()
        val resolved = mutable.ArrayBuffer[ROp]()
        txOps.foreach {
          case MCreateNode(_) =>
            val id = tx.createNode(); pool :+= id; resolved += RCreateNode(id)
          case MCreateRel(si, di, t) =>
            val src = pool(si % pool.size); val dst = pool(di % pool.size)
            val id = tx.createRelationship(src, dst, t)
            relPool :+= id; resolved += RCreateRel(id, src, dst, t)
          case MSetProp(i, k, v) =>
            val n = pool(i % pool.size)
            tx.setProperty(n, k, v); resolved += RSetProp(n, k, v)
          case MRemoveProp(i, k) =>
            val n = pool(i % pool.size)
            tx.removeProperty(n, k); resolved += RRemoveProp(n, k)
          case MDelNode(i) =>
            val n = pool(i % pool.size)
            tx.delete(n); resolved += RDelNode(n)
          case MDelRel(i) =>
            if (relPool.nonEmpty) {
              val r = relPool(i % relPool.size)
              tx.deleteRelationship(r); resolved += RDelRel(r)
            }
        }
        tx.success()
        val committed = try { tx.finish(); true }
        catch { case _: Exception => false }
        val expected = validates(resolved.toSeq, nodes.keySet, rels)
        assert(committed === expected,
          s"session ${if (committed) "committed" else "aborted"} but model " +
            s"says ${if (expected) "commit" else "abort"} for $resolved")
        if (committed) resolved.foreach {
          case RCreateNode(id) => nodes += id -> Map.empty
          case RCreateRel(id, src, dst, t) => rels += id -> ((src, dst, t))
          case RSetProp(id, k, v) => nodes += id -> (nodes(id) + (k -> v))
          case RRemoveProp(id, k) =>
            if (nodes.contains(id)) nodes += id -> (nodes(id) - k)
          case RDelNode(id) => nodes -= id
          case RDelRel(id) => rels -= id
        }
      }
      val snap = s.snapshot
      snap.nodes == nodes &&
        snap.rels.view.mapValues(t => (t._1, t._2, t._3)).toMap == rels
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(40)
      .withInitialSeed(Seed(4242L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
