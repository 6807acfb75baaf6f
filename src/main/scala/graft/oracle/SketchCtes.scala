package graft.oracle

import graft.operators.Sketch._

/** DuckDB twin of [[graft.operators.Sketch]] — identical integer
  * registers (32-bit multiplicative hash, high-byte bucket,
  * CASE-cascade bit length, max-rho per bucket, integer Z'),
  * identical single-constant numerator. */
object SketchCtes {

  private val caseChain =
    (SuffixBits to 1 by -1).map(b => s"WHEN rest >= ${1L << (b - 1)} THEN $b")
      .mkString(" ")

  val hllOrders: String =
    s"""WITH h0 AS (SELECT l_orderkey % $HashMod AS h FROM lineitem),
       |h1 AS (SELECT xor(h, h >> 16) AS h FROM h0),
       |h2 AS (SELECT (h * $MixMult) % $HashMod AS h FROM h1),
       |h3 AS (SELECT xor(h, h >> 16) AS h FROM h2),
       |h4 AS (SELECT (h * $MixMult) % $HashMod AS h FROM h3),
       |h AS (SELECT xor(h, h >> 16) AS h FROM h4),
       |x AS (SELECT h // ${1L << SuffixBits} AS bucket,
       |             h % ${1L << SuffixBits} AS rest FROM h),
       |r AS (SELECT bucket, $Scale - (CASE $caseChain ELSE 0 END) AS rho FROM x),
       |regs AS (SELECT bucket, max(rho) AS m_j FROM r GROUP BY bucket),
       |f AS (SELECT coalesce(regs.m_j, 0) AS m_j
       |  FROM generate_series(0, ${Buckets - 1}) g(bucket)
       |  LEFT JOIN regs ON g.bucket = regs.bucket),
       |z AS (SELECT sum(CAST(1 AS BIGINT) << ($Scale - m_j)) AS z FROM f)
       |SELECT CAST($Buckets AS BIGINT) AS m, CAST(z AS BIGINT) AS z,
       |  $EstNumerator / z AS est,
       |  (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS exact
       |FROM z""".stripMargin
}
