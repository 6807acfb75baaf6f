package graft.oracle

import graft.operators.Iterative.{BfsIters, CcIters, SsspIters, Unreachable, WeightMod}

/** DuckDB twins of [[graft.operators.Iterative]] — the same bounded
  * min-propagation with the rounds unrolled as chained CTEs (no
  * reliance on recursive-CTE aggregation support). */
object IterCtes {

  /** bounded min-propagation rounds as chained CTEs over `edges`,
    * starting from `l0(node, label)` — shared with the dedup-cluster
    * oracle ([[graft.oracle.TextCtes.dedupClusters]]). */
  private[oracle] def unrolled(iters: Int, delta: Long): String =
    (0 until iters).map { i =>
      s"""l${i + 1} AS MATERIALIZED (
         |  SELECT v.node, least(v.label, coalesce(m.minl, v.label)) AS label
         |  FROM l$i v LEFT JOIN (
         |    SELECT e.dst AS node, min(l.label + $delta) AS minl
         |    FROM edges e JOIN l$i l ON e.src = l.node GROUP BY e.dst) m
         |  ON v.node = m.node)""".stripMargin
    }.mkString(",\n")

  /** twin of Iterative.connectedComponentsConverged: the same rounds
    * unrolled to the generous bound — extra rounds past the fixpoint
    * are no-ops on both engines, so early exit ≡ full unroll. */
  val connectedComponentsConverged: String = {
    val iters = graft.operators.Iterative.CcConvergeIters
    s"""${Ctes.graph},
       |hp AS (SELECT src, dst FROM rels WHERE type = 'HAS_PART'),
       |edges AS MATERIALIZED (SELECT src, dst FROM hp UNION ALL SELECT dst, src FROM hp),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges),
       |${unrolled(iters, 0L)},
       |comp AS (SELECT label, count(*) AS n_nodes FROM l$iters GROUP BY label)
       |SELECT n_nodes AS component_size, count(*) AS n_components
       |FROM comp GROUP BY n_nodes""".stripMargin
  }

  val connectedComponents: String =
    s"""${Ctes.graph},
       |hp AS (SELECT src, dst FROM rels WHERE type = 'HAS_PART'),
       |edges AS (SELECT src, dst FROM hp UNION ALL SELECT dst, src FROM hp),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |${unrolled(CcIters, 0L)}
       |SELECT node, label FROM l$CcIters""".stripMargin

  /** twin of Iterative.labelPropagation: synchronous vote rounds
    * unrolled, argmax by (count desc, label asc) */
  val labelPropagation: String = {
    val iters = graft.operators.Iterative.LpaIters
    val rounds = (0 until iters).map { i =>
      s"""l${i + 1} AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT e.dst AS node, l.label,
         |      row_number() OVER (PARTITION BY e.dst
         |        ORDER BY count(*) DESC, l.label) AS rn
         |    FROM edges e JOIN l$i l ON e.src = l.node
         |    GROUP BY e.dst, l.label)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""${Ctes.graph},
       |hp AS (SELECT src, dst FROM rels WHERE type = 'HAS_PART'),
       |edges AS MATERIALIZED (SELECT src, dst FROM hp UNION ALL SELECT dst, src FROM hp),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges),
       |$rounds
       |SELECT node, label FROM l$iters""".stripMargin
  }

  /** weighted min-plus rounds (bounded Bellman-Ford) over
    * `wedges(src, dst, w)` — the twin of
    * [[graft.operators.Iterative.iterateMinPlus]]. */
  private def unrolledW(iters: Int): String =
    (0 until iters).map { i =>
      s"""l${i + 1} AS MATERIALIZED (
         |  SELECT v.node, least(v.label, coalesce(m.minl, v.label)) AS label
         |  FROM l$i v LEFT JOIN (
         |    SELECT e.dst AS node, min(l.label + e.w) AS minl
         |    FROM wedges e JOIN l$i l ON e.src = l.node GROUP BY e.dst) m
         |  ON v.node = m.node)""".stripMargin
    }.mkString(",\n")

  val sssp: String =
    s"""${Ctes.graph},
       |wedges AS (
       |  SELECT src, dst, id % $WeightMod + 1 AS w FROM rels
       |  UNION ALL SELECT dst, src, id % $WeightMod + 1 FROM rels),
       |l0 AS (SELECT id AS node,
       |  CASE WHEN kind = 'region' THEN 0 ELSE $Unreachable END AS label
       |FROM nodes),
       |${unrolledW(SsspIters)}
       |SELECT label AS dist, count(*) AS n_nodes FROM l$SsspIters GROUP BY label""".stripMargin

  /** twin of [[graft.operators.Iterative.kcore]]: unrolled peel
    * rounds (degree count → keep ≥ K → filter both endpoints). */
  val kcore: String = {
    val k = graft.operators.Iterative.KcoreK
    val iters = graft.operators.Iterative.KcoreIters
    val rounds = (1 to iters).map { i =>
      s"""k$i AS MATERIALIZED (SELECT src AS node FROM e${i - 1} GROUP BY src
         |  HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
         |  JOIN k$i a ON e.src = a.node
         |  JOIN k$i b ON e.dst = b.node)""".stripMargin
    }.mkString(",\n")
    s"""${Ctes.graph},
       |e0 AS (SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels),
       |$rounds
       |SELECT n.kind, count(*) AS n_nodes
       |FROM (SELECT DISTINCT src AS id FROM e$iters) s
       |JOIN nodes n USING (id)
       |GROUP BY n.kind""".stripMargin
  }

  /** twin of [[graft.operators.GraphOps.triangleCount]]: lineitem
    * co-occurrence edges, degree-ordered orientation, wedge + closing
    * join. */
  val triangles: String = {
    val B = Ctes.B
    val rank = graft.operators.GraphOps.RankBase
    s"""WITH li AS (
       |  SELECT ${6 * B} + l_orderkey AS o, ${5 * B} + l_partkey AS p,
       |         ${4 * B} + l_suppkey AS s FROM lineitem),
       |raw AS (
       |  SELECT o AS x, p AS y FROM li
       |  UNION ALL SELECT o, s FROM li
       |  UNION ALL SELECT p, s FROM li),
       |und AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw),
       |deg AS (SELECT n, count(*) AS deg FROM (
       |  SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY n),
       |ranked AS (
       |  SELECT u.a, u.b, da.deg * $rank + u.a AS ra, db.deg * $rank + u.b AS rb
       |  FROM und u JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
       |o AS (
       |  SELECT CASE WHEN ra < rb THEN a ELSE b END AS u,
       |         CASE WHEN ra < rb THEN b ELSE a END AS v FROM ranked),
       |tri AS (
       |  SELECT 1 FROM o e1
       |  JOIN o e2 ON e1.v = e2.u
       |  JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v)
       |SELECT (SELECT count(*) FROM und) AS n_edges,
       |       (SELECT count(*) FROM tri) AS n_triangles""".stripMargin
  }

  val bfsDepth: String =
    s"""${Ctes.graph},
       |edges AS (SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels),
       |l0 AS (SELECT id AS node,
       |  CASE WHEN kind = 'region' THEN 0 ELSE $Unreachable END AS label
       |FROM nodes),
       |${unrolled(BfsIters, 1L)}
       |SELECT label AS depth, count(*) AS n_nodes FROM l$BfsIters GROUP BY label""".stripMargin
}
