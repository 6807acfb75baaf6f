package graft.oracle

import graft.operators.Iterative.{BfsIters, CcIters, Unreachable}

/** DuckDB twins of [[graft.operators.Iterative]] — the same bounded
  * min-propagation with the rounds unrolled as chained CTEs (no
  * reliance on recursive-CTE aggregation support). */
object IterCtes {

  /** bounded min-propagation rounds as chained CTEs over `edges`,
    * starting from `l0(node, label)` — shared with the dedup-cluster
    * oracle ([[graft.oracle.TextCtes.dedupClusters]]). */
  private[oracle] def unrolled(iters: Int, delta: Long): String =
    (0 until iters).map { i =>
      s"""l${i + 1} AS (
         |  SELECT v.node, least(v.label, coalesce(m.minl, v.label)) AS label
         |  FROM l$i v LEFT JOIN (
         |    SELECT e.dst AS node, min(l.label + $delta) AS minl
         |    FROM edges e JOIN l$i l ON e.src = l.node GROUP BY e.dst) m
         |  ON v.node = m.node)""".stripMargin
    }.mkString(",\n")

  val connectedComponents: String =
    s"""${Ctes.graph},
       |hp AS (SELECT src, dst FROM rels WHERE type = 'HAS_PART'),
       |edges AS (SELECT src, dst FROM hp UNION ALL SELECT dst, src FROM hp),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |${unrolled(CcIters, 0L)}
       |SELECT node, label FROM l$CcIters""".stripMargin

  val bfsDepth: String =
    s"""${Ctes.graph},
       |edges AS (SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels),
       |l0 AS (SELECT id AS node,
       |  CASE WHEN kind = 'region' THEN 0 ELSE $Unreachable END AS label
       |FROM nodes),
       |${unrolled(BfsIters, 1L)}
       |SELECT label AS depth, count(*) AS n_nodes FROM l$BfsIters GROUP BY label""".stripMargin
}
