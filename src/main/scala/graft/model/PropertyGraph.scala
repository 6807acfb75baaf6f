package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tpch

/** The logical property-graph data model (SURVEY.md §1.6).
  *
  * Mirrors the reference's directed property multigraph — node store +
  * relationship store (reference: consistency-check/.../RecordType.java:22-28,
  * NodeRecordCheck.java:29-57, RelationshipRecordCheck.java:34-37) — as two
  * DataFrames:
  *
  *   nodes(id LONG, kind STRING, name STRING)
  *   rels (id LONG, src LONG, dst LONG, type STRING)
  *
  * Adjacency is recovered by join/groupBy on src/dst instead of the
  * reference's per-node doubly-linked relationship chains
  * (RelationshipNodeField.java:33-110) — set semantics, shuffle-friendly,
  * and partitionable at 100 TB (hash-partition both tables by the join key;
  * the dimension-sized node kinds broadcast).
  */
case class PropertyGraph(nodes: DataFrame, rels: DataFrame)

/** Derives a deterministic property graph from the TPC-H-ish test corpus.
  *
  * Entity keys are disjoint per table only, so node ids are namespaced by
  * kind: id = KIND_BASE * kindCode + key. Pure arithmetic — no shuffle, no
  * driver-side id allocation, safe at any scale (cf. reference id allocation
  * ha/.../IdAllocation.java: master-granted id ranges; here the namespace
  * arithmetic plays that role).
  *
  * The exact same derivation is expressed as SQL CTEs in
  * [[graft.oracle.Ctes]] for the DuckDB oracle; the two must stay in sync.
  */
object TpchGraph {
  val Base = 1000000000000L // 1e12 — above any key at any realistic sf

  /** Session-level memo of the derived graph tables, keyed by
    * (session, dir): ~15 queries per Verify/Bench run start from
    * nodes/rels, and without sharing each re-reads the parquet and
    * re-runs the lineitem row_number window. Lazy persist — the first
    * consumer fills the cache; at cluster scale this is the
    * materialize-the-graph-once step every serious deployment does.
    * Entries evict when the session ends ([[graft.SessionMemo]]). */
  private val memo = new graft.SessionMemo[DataFrame]
  private def memoized(spark: SparkSession, dir: String, what: String)(
      build: => DataFrame): DataFrame =
    memo.getOrElseUpdate(spark, s"$dir#$what")(build.persist())

  // node kind codes
  val Region = 1L; val Nation = 2L; val Customer = 3L
  val Supplier = 4L; val Part = 5L; val Order = 6L
  // relationship kind codes (id namespaces for rels)
  val RInRegion = 11L; val RCustNation = 12L; val RSuppNation = 13L
  val RPlacedBy = 14L; val RHasPart = 15L; val RSuppliedBy = 16L

  def nodes(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "nodes")(buildNodes(spark, dir))

  private def buildNodes(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tpch.table(spark, dir, n)
    val region = t("region").select(
      (lit(Region * Base) + col("r_regionkey")).as("id"),
      lit("region").as("kind"), col("r_name").as("name"))
    val nation = t("nation").select(
      (lit(Nation * Base) + col("n_nationkey")).as("id"),
      lit("nation").as("kind"), col("n_name").as("name"))
    val customer = t("customer").select(
      (lit(Customer * Base) + col("c_custkey")).as("id"),
      lit("customer").as("kind"), col("c_name").as("name"))
    val supplier = t("supplier").select(
      (lit(Supplier * Base) + col("s_suppkey")).as("id"),
      lit("supplier").as("kind"), col("s_name").as("name"))
    val part = t("part").select(
      (lit(Part * Base) + col("p_partkey")).as("id"),
      lit("part").as("kind"), col("p_name").as("name"))
    val order = t("orders").select(
      (lit(Order * Base) + col("o_orderkey")).as("id"),
      lit("order").as("kind"),
      concat(lit("order-"), col("o_orderkey").cast("string")).as("name"))
    region.unionAll(nation).unionAll(customer).unionAll(supplier)
      .unionAll(part).unionAll(order)
  }

  def rels(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "rels")(buildRels(spark, dir))

  private def buildRels(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tpch.table(spark, dir, n)
    val inRegion = t("nation").select(
      (lit(RInRegion * Base) + col("n_nationkey")).as("id"),
      (lit(Nation * Base) + col("n_nationkey")).as("src"),
      (lit(Region * Base) + col("n_regionkey")).as("dst"),
      lit("IN_REGION").as("type"))
    val custNation = t("customer").select(
      (lit(RCustNation * Base) + col("c_custkey")).as("id"),
      (lit(Customer * Base) + col("c_custkey")).as("src"),
      (lit(Nation * Base) + col("c_nationkey")).as("dst"),
      lit("IN_NATION").as("type"))
    val suppNation = t("supplier").select(
      (lit(RSuppNation * Base) + col("s_suppkey")).as("id"),
      (lit(Supplier * Base) + col("s_suppkey")).as("src"),
      (lit(Nation * Base) + col("s_nationkey")).as("dst"),
      lit("IN_NATION").as("type"))
    val placedBy = t("orders").select(
      (lit(RPlacedBy * Base) + col("o_orderkey")).as("id"),
      (lit(Order * Base) + col("o_orderkey")).as("src"),
      (lit(Customer * Base) + col("o_custkey")).as("dst"),
      lit("PLACED_BY").as("type"))
    // (l_orderkey, l_linenumber) is NOT unique in this corpus (dup line
    // numbers); a deterministic per-order row_number gives each lineitem
    // a stable slot 1..n (n ≤ 17 < 32). Rows fully tied on the sort key
    // are interchangeable, so the derived rel SET is still deterministic.
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice")
    // one windowed pass over lineitem emitting BOTH rels per row:
    // separate HAS_PART/SUPPLIED_BY branches would each re-run the
    // row_number sort (Catalyst does not share common subtrees across
    // union branches)
    val li = t("lineitem").withColumn("rn", row_number().over(wOrd))
      .select(col("l_orderkey"), col("rn"), col("l_partkey"), col("l_suppkey"))
    val liRels = li.select(explode(array(
      struct(
        (lit(RHasPart * Base) + col("l_orderkey") * 32 + col("rn")).as("id"),
        (lit(Order * Base) + col("l_orderkey")).as("src"),
        (lit(Part * Base) + col("l_partkey")).as("dst"),
        lit("HAS_PART").as("type")),
      struct(
        (lit(RSuppliedBy * Base) + col("l_orderkey") * 32 + col("rn")).as("id"),
        (lit(Order * Base) + col("l_orderkey")).as("src"),
        (lit(Supplier * Base) + col("l_suppkey")).as("dst"),
        lit("SUPPLIED_BY").as("type")))).as("r"))
      .select(col("r.id").as("id"), col("r.src").as("src"),
        col("r.dst").as("dst"), col("r.type").as("type"))
    inRegion.unionAll(custNation).unionAll(suppNation)
      .unionAll(placedBy).unionAll(liRels)
  }

  /** rels WITHOUT the id column, for operators that only need
    * (src, dst, type) — degree counts, traversals, expands. A column
    * prune over the shared memoized rel cache: the id window is paid
    * once per session, and every consumer after that reads the same
    * in-memory table. */
  def relsLite(spark: SparkSession, dir: String): DataFrame =
    rels(spark, dir).select(col("src"), col("dst"), col("type"))

  def apply(spark: SparkSession, dir: String): PropertyGraph =
    PropertyGraph(nodes(spark, dir), rels(spark, dir))
}
