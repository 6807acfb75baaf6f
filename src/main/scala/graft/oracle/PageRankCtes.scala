package graft.oracle

import graft.operators.PageRank.{Iters, RestartUnit, Scale, TopK}

/** DuckDB twins of [[graft.operators.PageRank]]: same fixed-point
  * rounds, unrolled; the personalized variant only changes the `ind`
  * restart indicator, exactly as the Spark side does. */
object PageRankCtes {
  private def ranks(indSql: String): String = {
    val rounds = (0 until Iters).map { i =>
      s"""pr${i + 1} AS (
         |  SELECT n.node, n.ind,
         |    $RestartUnit * n.ind + (85 * coalesce(s.inflow, CAST(0 AS BIGINT))) // 100 AS pr
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
       |vnodes AS (SELECT id AS node, $indSql AS ind FROM nodes),
       |pr0 AS (SELECT node, ind, CAST($Scale AS BIGINT) * ind AS pr FROM vnodes),
       |$rounds,
       |rk AS (SELECT node, pr,
       |  row_number() OVER (ORDER BY pr DESC, node) AS rnk FROM pr$Iters)
       |SELECT rnk AS rank, node, pr FROM rk WHERE rnk <= $TopK""".stripMargin
  }

  val topRanks: String = ranks("CAST(1 AS BIGINT)")

  val personalized: String =
    ranks("CAST(CASE WHEN kind = 'supplier' THEN 1 ELSE 0 END AS BIGINT)")
}
