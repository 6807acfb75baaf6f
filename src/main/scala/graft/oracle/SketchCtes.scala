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

  /** grouped-HLL twin of Sketch.hllDistinctBy over any
    * `src(grp, k)` subquery: registers keyed (group, bucket),
    * per-group Z' and estimate; `alias` names the group column. */
  private def groupedHll(srcSql: String, alias: String): String =
    s"""WITH src AS ($srcSql),
       |h0 AS (SELECT grp, k % $HashMod AS h FROM src),
       |h1 AS (SELECT grp, xor(h, h >> 16) AS h FROM h0),
       |h2 AS (SELECT grp, (h * $MixMult) % $HashMod AS h FROM h1),
       |h3 AS (SELECT grp, xor(h, h >> 16) AS h FROM h2),
       |h4 AS (SELECT grp, (h * $MixMult) % $HashMod AS h FROM h3),
       |h AS (SELECT grp, xor(h, h >> 16) AS h FROM h4),
       |x AS (SELECT grp, h // ${1L << SuffixBits} AS bucket,
       |             h % ${1L << SuffixBits} AS rest FROM h),
       |r AS (SELECT grp, bucket, $Scale - (CASE $caseChain ELSE 0 END) AS rho FROM x),
       |regs AS (SELECT grp, bucket, max(rho) AS m_j FROM r GROUP BY 1, 2),
       |frame AS (SELECT grp, bucket FROM (SELECT DISTINCT grp FROM h0),
       |  generate_series(0, ${Buckets - 1}) t(bucket)),
       |f AS (SELECT frame.grp, coalesce(regs.m_j, 0) AS m_j
       |  FROM frame LEFT JOIN regs
       |  ON frame.grp = regs.grp AND frame.bucket = regs.bucket),
       |z AS (SELECT grp, CAST(sum(CAST(1 AS BIGINT) << ($Scale - m_j)) AS BIGINT) AS z,
       |  CAST(sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
       |  FROM f GROUP BY grp),
       |e AS (SELECT grp, CAST(count(DISTINCT k) AS BIGINT) AS exact
       |  FROM src GROUP BY 1)
       |SELECT z.grp AS $alias, CAST($Buckets AS BIGINT) AS m, z.z, z.v,
       |  CASE WHEN z.v > 0 AND $EstNumerator / z.z <= $LcCutoff
       |    THEN (${LcTable.mkString("[", ", ", "]")})[CAST(z.v AS INT) + 1]
       |    ELSE $EstNumerator / z.z END AS est,
       |  e.exact
       |FROM z JOIN e ON z.grp = e.grp""".stripMargin

  /** twin of Sketch.hllOrdersByFlag over (l_returnflag, l_orderkey) */
  val hllOrdersByFlag: String =
    groupedHll("SELECT l_returnflag AS grp, l_orderkey AS k FROM lineitem", "grp")

  /** twin of EventStreams.windowedDistinct: the same grouped sketch
    * keyed by integer epoch-hour over the event stream */
  val windowedDistinct: String = groupedHll(
    "SELECT (epoch_us(ts) // 1000000) // 3600 AS grp, user_id AS k FROM events",
    "win")

  /** twin of Sketch.cmsTopParts: identical (depth, cell) registers,
    * identical top-10 probe, min-over-depth estimate */
  val cmsTopParts: String = {
    def cell(kExpr: String) =
      s"(($kExpr * (1 + 6101 * d) + 9973 * d) % $CmsP) % $CmsWidth"
    s"""WITH keys AS (SELECT l_partkey AS k FROM lineitem),
       |cells AS (SELECT d, ${cell("k")} AS cell
       |  FROM keys, unnest(generate_series(0, ${CmsDepth - 1})) t(d)),
       |regs AS (SELECT d, cell, CAST(count(*) AS BIGINT) AS cnt
       |  FROM cells GROUP BY 1, 2),
       |top AS (SELECT k, CAST(count(*) AS BIGINT) AS exact FROM keys
       |  GROUP BY k ORDER BY exact DESC, k LIMIT 10),
       |probes AS (SELECT k, exact, d, ${cell("k")} AS cell
       |  FROM top, unnest(generate_series(0, ${CmsDepth - 1})) t(d))
       |SELECT k AS partkey, exact, CAST(min(cnt) AS BIGINT) AS est
       |FROM probes JOIN regs USING (d, cell) GROUP BY 1, 2""".stripMargin
  }

  /** twin of Sketch.bloomProbe: identical bit positions, all-K-hit
    * membership, exact semi-join truth, single-division fp rate */
  val bloomProbe: String = {
    def bit(kExpr: String) =
      s"(($kExpr * (1 + 7919 * i) + 104729 * i) % $CmsP) % $BloomBits"
    s"""WITH hi AS (SELECT o_orderkey AS k FROM orders
       |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > $BloomPriceCents),
       |bits AS (SELECT DISTINCT ${bit("k")} AS bit
       |  FROM hi, unnest(generate_series(0, ${BloomK - 1})) t(i)),
       |probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
       |pb AS (SELECT k, ${bit("k")} AS bit
       |  FROM probe, unnest(generate_series(0, ${BloomK - 1})) t(i)),
       |passd AS (SELECT k FROM pb JOIN bits USING (bit)
       |  GROUP BY k HAVING count(*) = $BloomK),
       |truth AS (SELECT k FROM probe WHERE k IN (SELECT k FROM hi)),
       |sel AS (SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_probe,
       |  (SELECT CAST(count(*) AS BIGINT) FROM passd) AS n_pass,
       |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true)
       |SELECT CAST($BloomBits AS BIGINT) AS m_bits, n_probe, n_pass, n_true,
       |  n_pass - n_true AS n_false_pos,
       |  (n_pass - n_true) / CAST(n_probe - n_true AS DOUBLE) AS fp_rate
       |FROM sel""".stripMargin
  }

  /** twin of [[graft.operators.Sketch.kmvOrders]]: same mix chain,
    * bottom-k by integer order, one double division. */
  val kmvOrders: String = {
    import graft.operators.Sketch.KmvK
    s"""WITH keys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
       |h0 AS (SELECT k % $HashMod AS h FROM keys),
       |h1 AS (SELECT xor(h, h >> 16) AS h FROM h0),
       |h2 AS (SELECT (h * $MixMult) % $HashMod AS h FROM h1),
       |h3 AS (SELECT xor(h, h >> 16) AS h FROM h2),
       |h4 AS (SELECT (h * $MixMult) % $HashMod AS h FROM h3),
       |hh AS (SELECT DISTINCT xor(h, h >> 16) AS h FROM h4),
       |tk AS (SELECT h FROM hh ORDER BY h LIMIT $KmvK),
       |s AS (SELECT max(h) AS h_k, count(*) AS kk FROM tk),
       |e AS (SELECT CAST(count(*) AS BIGINT) AS exact FROM keys)
       |SELECT kk AS k, h_k, (kk - 1) * $HashMod / h_k AS est, exact
       |FROM s, e""".stripMargin
  }

  /** twin of [[graft.operators.Sketch.sampleQuantiles]]: identical
    * degski sample predicate, identical integer rank picks. */
  val sampleQuantiles: String = {
    import graft.operators.Sketch.SampleMod
    def pick(num: Int, den: Int, name: String) =
      s"max(CASE WHEN rn = (cnt - 1) * $num // $den + 1 THEN cents END) AS $name"
    s"""WITH x AS (SELECT l_returnflag, l_orderkey, l_linenumber,
       |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
       |ra AS (SELECT l_returnflag, cents,
       |  row_number() OVER (PARTITION BY l_returnflag
       |    ORDER BY cents, l_orderkey, l_linenumber) AS rn,
       |  count(*) OVER (PARTITION BY l_returnflag) AS cnt FROM x),
       |exact AS (SELECT l_returnflag, count(*) AS n_total,
       |  max(CASE WHEN rn = (cnt - 1) // 2 + 1 THEN cents END)
       |    AS exact_p50_cents
       |  FROM ra GROUP BY 1),
       |h0 AS (SELECT *, (l_orderkey * 41 + l_linenumber) % $HashMod AS h FROM x),
       |h1 AS (SELECT * REPLACE (xor(h, h >> 16) AS h) FROM h0),
       |h2 AS (SELECT * REPLACE ((h * $MixMult) % $HashMod AS h) FROM h1),
       |h3 AS (SELECT * REPLACE (xor(h, h >> 16) AS h) FROM h2),
       |h4 AS (SELECT * REPLACE ((h * $MixMult) % $HashMod AS h) FROM h3),
       |hh AS (SELECT * REPLACE (xor(h, h >> 16) AS h) FROM h4),
       |s AS (SELECT l_returnflag, l_orderkey, l_linenumber, cents
       |  FROM hh WHERE h % $SampleMod = 0),
       |r AS (SELECT l_returnflag, cents,
       |  row_number() OVER (PARTITION BY l_returnflag
       |    ORDER BY cents, l_orderkey, l_linenumber) AS rn,
       |  count(*) OVER (PARTITION BY l_returnflag) AS cnt FROM s),
       |q AS (SELECT l_returnflag, count(*) AS n_sample,
       |  ${pick(1, 4, "p25_cents")},
       |  ${pick(1, 2, "p50_cents")},
       |  ${pick(9, 10, "p90_cents")},
       |  ${pick(99, 100, "p99_cents")}
       |  FROM r GROUP BY 1)
       |SELECT l_returnflag, n_total, exact_p50_cents, n_sample,
       |  p25_cents, p50_cents, p90_cents, p99_cents
       |FROM exact JOIN q USING (l_returnflag)""".stripMargin
  }

  /** twin of [[graft.operators.Sketch.kmvIntersect]]: per-set degski
    * mix chains, bottom-k estimates, inclusion-exclusion. */
  val kmvIntersect: String = {
    import graft.operators.Sketch.KmvK
    def mixChain(src: String, pre: String): String =
      s"""${pre}0 AS (SELECT k % $HashMod AS h FROM $src),
         |${pre}1 AS (SELECT xor(h, h >> 16) AS h FROM ${pre}0),
         |${pre}2 AS (SELECT (h * $MixMult) % $HashMod AS h FROM ${pre}1),
         |${pre}3 AS (SELECT xor(h, h >> 16) AS h FROM ${pre}2),
         |${pre}4 AS (SELECT (h * $MixMult) % $HashMod AS h FROM ${pre}3),
         |${pre}h AS (SELECT DISTINCT xor(h, h >> 16) AS h FROM ${pre}4)""".stripMargin
    s"""WITH ka AS (SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'),
       |kb AS (SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'A'),
       |${mixChain("ka", "a")},
       |${mixChain("kb", "b")},
       |ta AS (SELECT h FROM ah ORDER BY h LIMIT $KmvK),
       |ea AS (SELECT (count(*) - 1) * $HashMod / max(h) AS est_a FROM ta),
       |tb AS (SELECT h FROM bh ORDER BY h LIMIT $KmvK),
       |eb AS (SELECT (count(*) - 1) * $HashMod / max(h) AS est_b FROM tb),
       |hu AS (SELECT DISTINCT h FROM (SELECT h FROM ah UNION ALL SELECT h FROM bh)),
       |tu AS (SELECT h FROM hu ORDER BY h LIMIT $KmvK),
       |eu AS (SELECT (count(*) - 1) * $HashMod / max(h) AS est_union FROM tu),
       |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM ka JOIN kb USING (k))
       |SELECT est_a, est_b, est_union,
       |  est_a + est_b - est_union AS est_intersect, exact_intersect
       |FROM ea, eb, eu, ex""".stripMargin
  }
}
