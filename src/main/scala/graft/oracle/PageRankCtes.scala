package graft.oracle

import graft.operators.PageRank.{Iters, Scale, TopK}

/** DuckDB twin of [[graft.operators.PageRank.topRanks]]: same
  * fixed-point rounds, unrolled. */
object PageRankCtes {
  val topRanks: String = {
    val rounds = (0 until Iters).map { i =>
      s"""pr${i + 1} AS (
         |  SELECT n.node,
         |    (15 * CAST($Scale AS BIGINT)) // 100 + (85 * coalesce(s.inflow, CAST(0 AS BIGINT))) // 100 AS pr
         |  FROM vnodes n LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(p.pr // o.outdeg) AS BIGINT) AS inflow
         |    FROM edges e
         |    JOIN pr$i p ON e.src = p.node
         |    JOIN outdeg o ON e.src = o.node
         |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""${Ctes.graph},
       |edges AS (SELECT src, dst FROM rels),
       |outdeg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),
       |vnodes AS (SELECT id AS node FROM nodes),
       |pr0 AS (SELECT node, CAST($Scale AS BIGINT) AS pr FROM vnodes),
       |$rounds,
       |rk AS (SELECT node, pr,
       |  row_number() OVER (ORDER BY pr DESC, node) AS rnk FROM pr$Iters)
       |SELECT rnk AS rank, node, pr FROM rk WHERE rnk <= $TopK""".stripMargin
  }
}
