package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TpchGraph

/** The graph read-API surface (SURVEY.md §2.6, G1-G13) as DataFrame
  * pipelines over the derived property graph.
  *
  * Each op is expressed so Catalyst can push filters into the parquet
  * scans that feed TpchGraph (the union branches are scans with
  * per-branch projections; a kind/type filter prunes whole branches
  * at planning time via constant-folded `lit(kind) === ...`).
  */
object GraphOps {

  /** G9 getAllNodes + A3 record count per store: node census by kind. */
  def nodeCountByKind(spark: SparkSession, dir: String): DataFrame =
    TpchGraph.nodes(spark, dir)
      .groupBy("kind").agg(count(lit(1)).as("n"))

  /** A4 relationship count by type (GetRelationshipCountJob,
    * reference ha/src/test/java/slavetest/CommonJobs.java:286-306). */
  def relCountByType(spark: SparkSession, dir: String): DataFrame =
    TpchGraph.rels(spark, dir)
      .groupBy("type").agg(count(lit(1)).as("n"))

  /** G4 point lookup by id (getNodeById,
    * reference CommonJobs.java:237,267). */
  def nodeById(spark: SparkSession, dir: String, id: Long): DataFrame =
    TpchGraph.nodes(spark, dir).filter(col("id") === lit(id))

  /** G6 expand: relationships of one node filtered by type+direction
    * (getRelationships(type, Direction.OUTGOING),
    * reference AbstractHaTest.java:217-231). Vectorized over all nodes:
    * out-degree by (node, type); single shuffle on src.
    */
  def outDegreeByType(spark: SparkSession, dir: String): DataFrame =
    TpchGraph.rels(spark, dir)
      .groupBy(col("src").as("node_id"), col("type"))
      .agg(count(lit(1)).as("degree"))

  /** Two-hop traversal (iterative expand, SURVEY §1.6 "traversal"):
    * nation --IN_NATION<-- customer --PLACED_BY<-- order, counting
    * orders per nation. Expressed as two joins; the nation side is
    * dimension-sized so Catalyst broadcasts it (O2 small-store
    * materialization, reference FullCheck.java:127-142).
    */
  def ordersPerNation(spark: SparkSession, dir: String): DataFrame = {
    val nodes = TpchGraph.nodes(spark, dir)
    val rels = TpchGraph.rels(spark, dir)
    val nations = nodes.filter(col("kind") === "nation")
      .select(col("id").as("nation_id"), col("name").as("nation"))
    val custIn = rels.filter(col("type") === "IN_NATION")
      .select(col("src").as("cust_id"), col("dst").as("nation_id"))
    val placed = rels.filter(col("type") === "PLACED_BY")
      .select(col("src").as("order_id"), col("dst").as("cust_id"))
    placed
      .join(custIn, "cust_id")
      .join(broadcast(nations), "nation_id")
      .groupBy("nation").agg(count(lit(1)).as("n_orders"))
  }
}
