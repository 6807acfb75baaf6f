package graft.oracle

/** SQL text shared by the DuckDB-oracle queries (SparkEntry.oracleSql).
  *
  * These CTEs are the ANSI-SQL twin of the DataFrame derivations in
  * [[graft.model.TpchGraph]] (and, later, the record-twin stores). The
  * driver runs them in DuckDB against the same parquet tables and
  * hash-compares with the Spark result, so the two definitions MUST
  * produce identical rows.
  */
object Ctes {
  val B = 1000000000000L

  /** nodes(id, kind, name) — twin of TpchGraph.nodes */
  val nodes: String =
    s"""nodes AS (
       |  SELECT ${1 * B} + r_regionkey AS id, 'region' AS kind, r_name AS name FROM region
       |  UNION ALL SELECT ${2 * B} + n_nationkey, 'nation', n_name FROM nation
       |  UNION ALL SELECT ${3 * B} + c_custkey, 'customer', c_name FROM customer
       |  UNION ALL SELECT ${4 * B} + s_suppkey, 'supplier', s_name FROM supplier
       |  UNION ALL SELECT ${5 * B} + p_partkey, 'part', p_name FROM part
       |  UNION ALL SELECT ${6 * B} + o_orderkey, 'order', 'order-' || CAST(o_orderkey AS VARCHAR) FROM orders
       |)""".stripMargin

  /** rels(id, src, dst, type) — twin of TpchGraph.rels */
  val rels: String =
    s"""lw AS (
       |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
       |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
       |  FROM lineitem
       |),
       |rels AS (
       |  SELECT ${11 * B} + n_nationkey AS id, ${2 * B} + n_nationkey AS src, ${1 * B} + n_regionkey AS dst, 'IN_REGION' AS type FROM nation
       |  UNION ALL SELECT ${12 * B} + c_custkey, ${3 * B} + c_custkey, ${2 * B} + c_nationkey, 'IN_NATION' FROM customer
       |  UNION ALL SELECT ${13 * B} + s_suppkey, ${4 * B} + s_suppkey, ${2 * B} + s_nationkey, 'IN_NATION' FROM supplier
       |  UNION ALL SELECT ${14 * B} + o_orderkey, ${6 * B} + o_orderkey, ${3 * B} + o_custkey, 'PLACED_BY' FROM orders
       |  UNION ALL SELECT ${15 * B} + l_orderkey*32 + rn, ${6 * B} + l_orderkey, ${5 * B} + l_partkey, 'HAS_PART' FROM lw
       |  UNION ALL SELECT ${16 * B} + l_orderkey*32 + rn, ${6 * B} + l_orderkey, ${4 * B} + l_suppkey, 'SUPPLIED_BY' FROM lw
       |)""".stripMargin

  val graph: String = s"WITH $nodes, $rels"
}
