package graft.oracle

import graft.operators.Stress.{Depth, TopK}

/** DuckDB twin of [[graft.operators.Stress]]: the same fixed-depth
  * forward (σ) and backward (continuation-count c) passes over the
  * landmark shortest-path DAG, unrolled level by level. All scores are
  * path COUNTS (BIGINT), so the engines agree bit-for-bit. */
object StressCtes {
  val topStress: String = {
    val fwd = (1 to Depth).map { k =>
      s"""m$k AS (
         |  SELECT l.r, e.dst AS node, l.sigma
         |  FROM edges e JOIN l${k - 1} l ON e.src = l.node),
         |l$k AS (
         |  SELECT m.r, m.node, CAST(sum(m.sigma) AS BIGINT) AS sigma
         |  FROM m$k m LEFT JOIN s${k - 1} s ON s.r = m.r AND s.node = m.node
         |  WHERE s.node IS NULL GROUP BY 1, 2),
         |s$k AS (SELECT r, node FROM s${k - 1}
         |  UNION ALL SELECT r, node FROM l$k)""".stripMargin
    }.mkString(",\n")
    // backward: c over levels Depth-1 .. 1 (level Depth contributes
    // σ·0 rows; level 0 = landmarks accrue no stress)
    val bwd = (Depth - 1 to 1 by -1).map { k =>
      s"""cs$k AS (
         |  SELECT c.r, e.src AS node, CAST(sum(c.c) AS BIGINT) AS cs
         |  FROM edges e JOIN c${k + 1} c ON c.node = e.dst
         |  GROUP BY 1, 2),
         |c$k AS (
         |  SELECT l.r, l.node, l.sigma,
         |    CAST(1 + coalesce(cs.cs, 0) AS BIGINT) AS c
         |  FROM l$k l LEFT JOIN cs$k cs ON cs.r = l.r AND cs.node = l.node)""".stripMargin
    }.mkString(",\n")
    val contribs = (1 to Depth - 1)
      .map(k => s"SELECT node, sigma * (c - 1) AS s FROM c$k")
      .mkString(" UNION ALL ") +
      s" UNION ALL SELECT node, CAST(0 AS BIGINT) AS s FROM l$Depth"
    s"""${Ctes.graph},
       |edges AS (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels)),
       |l0 AS (SELECT id AS r, id AS node, CAST(1 AS BIGINT) AS sigma
       |  FROM nodes WHERE kind = 'region'),
       |s0 AS (SELECT r, node FROM l0),
       |$fwd,
       |c$Depth AS (SELECT r, node, CAST(1 AS BIGINT) AS c FROM l$Depth),
       |$bwd,
       |agg AS (SELECT node, CAST(sum(s) AS BIGINT) AS stress
       |  FROM ($contribs) GROUP BY node),
       |rk AS (SELECT a.node, n.kind, a.stress,
       |  row_number() OVER (ORDER BY a.stress DESC, a.node) AS rnk
       |  FROM agg a JOIN nodes n ON n.id = a.node)
       |SELECT rnk AS rank, node, kind, stress FROM rk WHERE rnk <= $TopK""".stripMargin
  }
}
