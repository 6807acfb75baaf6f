package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TpchGraph

/** Deterministic random-walk corpus over the property graph — the
  * DeepWalk / node2vec sampling stage of a graph-embedding training
  * pipeline (Perozzi et al., KDD'14).
  *
  * The reference has no whole-graph sampling; its traversals
  * (TraversalDescription) expand one start node at a time on a single
  * machine. At 100 TB the walk corpus is the thing you hand to the
  * embedding trainer, and generating it is embarrassingly parallel:
  * every (seed, walk) chain advances independently, so each step is ONE
  * shuffle join of the walk frontier against the adjacency table — no
  * global state, no driver loop over vertices. Cost per step is
  * O(|seeds|·walks), independent of |E| beyond the (reusable,
  * pre-partitioned) adjacency build.
  *
  * Engine-invariance: "random" neighbor choice is the degski mix
  * ([[Sketch.mix]]) of (node, seed, walk, step) reduced mod the node's
  * degree, against a neighbor index assigned by (src, dst-order)
  * row_number — both engines compute the identical integer, so the
  * corpus is bit-reproducible (which real pipelines want anyway: a
  * re-run must produce the same shards). No floats anywhere.
  */
object Walks {
  val NumWalks = 2 // walks started per seed
  val Steps = 4    // hops per walk

  /** distinct combine of the walk state for the next-hop draw; all
    * terms positive and < 2^62 (node ids ≤ 7e12 × 1009). */
  private def drawHash(step: Int) =
    Sketch.mix(pmod(col("node") * 1009L + col("seed") * 31L +
      col("walk") * 7L + step, lit(Sketch.HashMod)))

  private val memo = new graft.SessionMemo[DataFrame](outputMemo = true)

  def walkVisits(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate(spark, dir)(compute(spark, dir))

  private def compute(spark: SparkSession, dir: String): DataFrame = {
    val rels = TpchGraph.relsLite(spark, dir).select("src", "dst")
    // symmetrized simple graph; multi-edges collapse so the neighbor
    // index is well-defined
    val und = rels
      .unionAll(rels.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    // adjacency with per-node neighbor index and degree: one window
    // shuffle (both functions share the partitionBy(src) spec), then
    // pre-partitioned by node and persisted — every step joins this
    val wSpec = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val adj = und.select(col("src").as("node"), col("dst").as("nbr"),
        (row_number().over(wSpec.orderBy("dst")) - 1).cast("long").as("idx"),
        count(lit(1)).over(wSpec).as("deg"))
      .repartition(col("node")).persist()

    val seeds = TpchGraph.nodes(spark, dir).filter(col("kind") === "customer")
      .select(col("id").as("seed"),
        explode(sequence(lit(0L), lit(NumWalks - 1L))).as("walk"))
      .withColumn("node", col("seed"))

    val cached = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var state = seeds
    val layers = scala.collection.mutable.ListBuffer(
      seeds.withColumn("step", lit(0)))
    for (i <- 1 to Steps) {
      // next node = neighbor with index hash mod degree: frontier ⋈ adj
      // on (node, idx) — the only shuffle of the step. The draw hash is
      // computed on the frontier BEFORE the join (unambiguous `node`).
      val frontier = state.withColumn("h", drawHash(i))
      val next = frontier
        .join(adj, frontier("node") === adj("node") &&
          adj("idx") === pmod(frontier("h"), adj("deg")))
        .select(col("seed"), col("walk"), col("nbr").as("node"))
        .persist()
      cached += next
      layers += next.withColumn("step", lit(i))
      state = next
    }

    val nodeKinds = TpchGraph.nodes(spark, dir)
      .select(col("id").as("node"), col("kind"))
    val out = layers.reduce(_ unionByName _)
      .join(nodeKinds, "node")
      .groupBy("step", "kind")
      .agg(count(lit(1)).as("n_visits"), count_distinct(col("node")).as("n_nodes"))
      .persist()
    out.count() // materialize the ≤ (Steps+1)·|kinds| rows, then release
    adj.unpersist()
    cached.foreach(_.unpersist())
    out
  }
}
