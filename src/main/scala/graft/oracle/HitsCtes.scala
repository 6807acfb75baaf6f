package graft.oracle

import graft.operators.Hits.{Iters, Scale, TopK}

/** DuckDB twin of [[graft.operators.Hits]]: the same divisor-normalized
  * integer half-steps, unrolled. Both engines floor-divide non-negative
  * BIGINTs, so every score matches bit-for-bit. */
object HitsCtes {
  val topAuthorities: String = {
    val rounds = (0 until Iters).map { i =>
      s"""ar${i + 1} AS (
         |  SELECT e.dst AS node, CAST(sum(h.hub) AS BIGINT) AS raw
         |  FROM edges e JOIN h$i h ON e.src = h.node GROUP BY 1),
         |a${i + 1} AS (
         |  SELECT n.node, coalesce(r.raw, CAST(0 AS BIGINT)) //
         |    ((SELECT coalesce(max(raw), CAST(0 AS BIGINT)) FROM ar${i + 1})
         |      // $Scale + 1) AS auth
         |  FROM vnodes n LEFT JOIN ar${i + 1} r ON n.node = r.node),
         |hr${i + 1} AS (
         |  SELECT e.src AS node, CAST(sum(a.auth) AS BIGINT) AS raw
         |  FROM edges e JOIN a${i + 1} a ON e.dst = a.node GROUP BY 1),
         |h${i + 1} AS (
         |  SELECT n.node, coalesce(r.raw, CAST(0 AS BIGINT)) //
         |    ((SELECT coalesce(max(raw), CAST(0 AS BIGINT)) FROM hr${i + 1})
         |      // $Scale + 1) AS hub
         |  FROM vnodes n LEFT JOIN hr${i + 1} r ON n.node = r.node)""".stripMargin
    }.mkString(",\n")
    s"""${Ctes.graph},
       |edges AS (SELECT src, dst FROM rels),
       |vnodes AS (SELECT id AS node FROM nodes),
       |h0 AS (SELECT node, CAST($Scale AS BIGINT) AS hub FROM vnodes),
       |$rounds,
       |rk AS (SELECT a.node, a.auth, h.hub,
       |  row_number() OVER (ORDER BY a.auth DESC, a.node) AS rnk
       |  FROM a$Iters a JOIN h$Iters h ON a.node = h.node)
       |SELECT rnk AS rank, node, auth, hub FROM rk WHERE rnk <= $TopK""".stripMargin
  }
}
