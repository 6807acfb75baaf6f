package graft.oracle

import graft.operators.DataGen.{prngSql, M}

/** DuckDB twin of [[graft.operators.DataGen.summary]] — regenerates the
  * identical workload from range() using the same PRNG SQL text. The
  * string property's length formula substitutes for materializing the
  * content (the generator's length IS 50 + h%71). */
object GenCtes {
  private val N = 10000L

  val summary: String = {
    val int0 = prngSql("id", 0) + " % 16"
    val strLen = s"50 + ${prngSql("id", 100)} % 71"
    def relDst(stream: Long) = s"(${prngSql("src * 17 + j", stream)}) % $N"
    s"""WITH n AS (
       |  SELECT id, $int0 AS int00, $strLen AS slen FROM range($N) t(id)),
       |foo AS (
       |  SELECT id AS src, j, ${relDst(1000)} AS dst
       |  FROM range($N) t(id), (VALUES (0), (1)) AS jt(j)),
       |bar AS (
       |  SELECT id AS src, 0 AS j, ${relDst(1001)} AS dst FROM range($N) t(id))
       |SELECT 'nodes' AS metric, count(*) AS v1,
       |  CAST(sum(int00) AS BIGINT) AS v2, CAST(sum(slen) AS BIGINT) AS v3
       |FROM n
       |UNION ALL SELECT 'rels_FOO', count(*), count(DISTINCT dst),
       |  CAST(sum(dst) AS BIGINT) FROM foo
       |UNION ALL SELECT 'rels_BAR', count(*), count(DISTINCT dst),
       |  CAST(sum(dst) AS BIGINT) FROM bar""".stripMargin
  }

  /** Twin of [[graft.checker.ScaleCheck.profile]] at n=2000: every
    * record-store count recomputed in closed form from the same PRNG
    * (string chains are ceil(len/16) blocks, arrays 50 bytes → 4
    * blocks, +1 property record / +2 blocks for the NeoStore chain),
    * and the clean-store invariant — a freshly generated store checks
    * VIOLATION-FREE — pinned as a hash-compared zero. */
  val storeCheck: String = {
    val n2 = 2000L
    val strLen = s"50 + ${prngSql("id", 100)} % 71"
    s"""WITH n AS (SELECT id, $strLen AS slen FROM range($n2) t(id)),
       |r AS (SELECT id, j FROM range($n2) t(id), (VALUES (0), (1), (2)) AS jt(j))
       |SELECT 'nodes' AS store, CAST(count(*) AS BIGINT) AS n FROM n
       |UNION ALL SELECT 'rels', CAST(count(*) AS BIGINT) FROM r
       |UNION ALL SELECT 'props', CAST(count(*) + 1 AS BIGINT) FROM n
       |UNION ALL SELECT 'blocks', CAST(4 * count(*) + 2 AS BIGINT) FROM n
       |UNION ALL SELECT 'strings', CAST(sum((slen + 15) // 16) AS BIGINT) FROM n
       |UNION ALL SELECT 'arrays', CAST(4 * count(*) AS BIGINT) FROM n
       |UNION ALL SELECT 'violations', CAST(0 AS BIGINT)""".stripMargin
  }
}
