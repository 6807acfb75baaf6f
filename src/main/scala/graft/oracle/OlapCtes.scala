package graft.oracle

import graft.operators.Olap

/** DuckDB twins of [[graft.operators.Olap]]. */
object OlapCtes {

  private val cents =
    "x AS (SELECT *, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem)"

  val rollupReport: String =
    s"""WITH $cents
       |SELECT l_returnflag, l_linestatus, count(*) AS n,
       |  CAST(sum(cents) AS BIGINT) AS total_cents,
       |  sum(l_quantity) AS total_qty
       |FROM x GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** same pure-integer discrete index: (n−1)·num//den + 1 */
  val percentiles: String = {
    def pick(num: Int, den: Int, name: String) =
      s"max(CASE WHEN rn = (cnt - 1) * $num // $den + 1 THEN cents END) AS $name"
    s"""WITH $cents,
       |r AS (SELECT l_returnflag, cents,
       |  row_number() OVER (PARTITION BY l_returnflag
       |    ORDER BY cents, l_orderkey, l_linenumber) AS rn,
       |  count(*) OVER (PARTITION BY l_returnflag) AS cnt FROM x)
       |SELECT l_returnflag, count(*) AS n,
       |  ${pick(1, 2, "p50_cents")},
       |  ${pick(9, 10, "p90_cents")},
       |  ${pick(99, 100, "p99_cents")}
       |FROM r GROUP BY l_returnflag""".stripMargin
  }

  val pivotEvents: String = {
    val cols = Olap.EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id""".stripMargin
  }

  val gapFillHourly: String =
    s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour FROM events),
       |o AS (SELECT event_type, hour, count(*) AS n FROM h GROUP BY 1, 2),
       |b AS (SELECT event_type, CAST(min(hour) AS TIMESTAMP) AS h0,
       |  CAST(max(hour) AS TIMESTAMP) AS h1 FROM h GROUP BY 1),
       |s AS (SELECT event_type,
       |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b)
       |SELECT s.event_type, s.hour, CAST(coalesce(o.n, 0) AS BIGINT) AS n
       |FROM s LEFT JOIN o ON s.event_type = o.event_type AND s.hour = o.hour""".stripMargin

  /** twin of Olap.trimmedMean: integer (cents, key) rank, n div 10
    * trim bounds, one final division of exact sums */
  val trimmedMean: String =
    s"""WITH o AS (SELECT o_orderpriority AS prio, o_orderkey,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
       |r AS (SELECT prio, cents,
       |    CAST(row_number() OVER (PARTITION BY prio ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY prio) AS BIGINT) AS n FROM o)
       |SELECT prio, count(*) AS n_kept, CAST(sum(cents) AS BIGINT) AS sum_cents,
       |  CAST(sum(cents) AS BIGINT) / CAST(count(*) AS DOUBLE) AS trimmed_mean_cents
       |FROM r WHERE rn > n // 10 AND rn <= n - n // 10 GROUP BY prio""".stripMargin

  val editRefine: String =
    s"""WITH ${TextCtes.nearCorpus},
       |pfx AS (SELECT doc_id, substr(text, 1, ${Olap.EditPrefix}) AS p FROM near_corpus),
       |lsh AS (SELECT a, b FROM (${TextCtes.minhashLsh}))
       |SELECT l.a, l.b, CAST(levenshtein(pa.p, pb.p) AS BIGINT) AS dist
       |FROM lsh l
       |JOIN pfx pa ON l.a = pa.doc_id
       |JOIN pfx pb ON l.b = pb.doc_id
       |WHERE levenshtein(pa.p, pb.p) <= ${Olap.EditMax}""".stripMargin

  /** twin of Olap.zorderReport: the Morton interleave is the SAME
    * generated SQL text Spark evaluates. */
  val zorderReport: String = {
    val z = Olap.zInterleaveSql(s"(o_custkey & ${(1 << Olap.ZBits) - 1})",
      s"(CAST(epoch_us(o_orderdate) // ${86400L * 1000000L} AS BIGINT) & ${(1 << Olap.ZBits) - 1})")
    s"""WITH o AS (SELECT *, epoch_us(o_orderdate) // ${86400L * 1000000L} AS day,
       |  $z AS z FROM orders)
       |SELECT z >> 20 AS bucket, count(*) AS n,
       |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
       |  min(day) AS min_day, max(day) AS max_day
       |FROM o GROUP BY 1""".stripMargin
  }

  /** twin of Olap.orderCorr: identical integer moments and the same
    * fixed-order double expression. */
  val orderCorr: String =
    """WITH li AS (SELECT l_orderkey AS k, count(*) AS x
      |  FROM lineitem GROUP BY 1),
      |o AS (SELECT o_orderkey AS k,
      |  CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS y FROM orders),
      |j AS (SELECT coalesce(li.x, 0) AS x, o.y
      |  FROM o LEFT JOIN li USING (k)),
      |m AS (SELECT count(*) AS n,
      |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |  CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
      |  CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM j)
      |SELECT n, sx, sy,
      |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |  (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
      |   sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS corr
      |FROM m""".stripMargin

  /** twin of Olap.groupingSets: same level sets and grouping id. */
  val groupingSets: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin

  /** twin of Pipeline.weightedSample: identical mix-hash keep rule and
    * checksum. */
  val weightedSample: String = {
    import graft.operators.Pipeline.{BalanceP, WeightCap}
    import graft.operators.Sketch.{HashMod, MixMult}
    s"""WITH d0 AS (SELECT doc_id, source, n_chars,
       |  (doc_id * 97) % $HashMod AS h FROM documents),
       |d1 AS (SELECT * REPLACE (xor(h, h >> 16) AS h) FROM d0),
       |d2 AS (SELECT * REPLACE ((h * $MixMult) % $HashMod AS h) FROM d1),
       |d3 AS (SELECT * REPLACE (xor(h, h >> 16) AS h) FROM d2),
       |d4 AS (SELECT * REPLACE ((h * $MixMult) % $HashMod AS h) FROM d3),
       |d AS (SELECT doc_id, source, n_chars,
       |  CASE WHEN (xor(h, h >> 16) % $WeightCap) < n_chars
       |       THEN 1 ELSE 0 END AS keep FROM d4)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(keep) AS BIGINT) AS n_kept,
       |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
       |  CAST(sum(keep * n_chars) AS BIGINT) AS chars_kept,
       |  CAST(CAST(sum(keep * ((doc_id * 31) % $BalanceP)) AS HUGEINT)
       |    % $BalanceP AS BIGINT) AS kept_sum
       |FROM d GROUP BY source""".stripMargin
  }

  /** twin of Olap.dqChecks: same constraint fold, long-format output. */
  val dqChecks: String =
    s"""WITH o AS (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders),
       |f AS (SELECT count(*) AS n_rows,
       |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null_cust,
       |  CAST(sum(CASE WHEN cents <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price_range,
       |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT)
       |    AS v_status_domain,
       |  count(*) - CAST(count(DISTINCT o_orderkey) AS BIGINT) AS v_dup_key,
       |  (SELECT count(*) FROM o
       |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS v_orphan_cust
       |  FROM o)
       |SELECT 'completeness_custkey' AS constraint, n_rows,
       |  v_null_cust AS n_violations,
       |  CAST(CASE WHEN v_null_cust = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass FROM f
       |UNION ALL SELECT 'range_totalprice_positive', n_rows, v_price_range,
       |  CAST(CASE WHEN v_price_range = 0 THEN 1 ELSE 0 END AS BIGINT) FROM f
       |UNION ALL SELECT 'domain_orderstatus', n_rows, v_status_domain,
       |  CAST(CASE WHEN v_status_domain = 0 THEN 1 ELSE 0 END AS BIGINT) FROM f
       |UNION ALL SELECT 'unique_orderkey', n_rows, v_dup_key,
       |  CAST(CASE WHEN v_dup_key = 0 THEN 1 ELSE 0 END AS BIGINT) FROM f
       |UNION ALL SELECT 'referential_custkey', n_rows, v_orphan_cust,
       |  CAST(CASE WHEN v_orphan_cust = 0 THEN 1 ELSE 0 END AS BIGINT) FROM f""".stripMargin

  /** twin of Olap.skewReport: per-key counts, head by (count desc,
    * key), totals alongside. */
  val skewReport: String =
    s"""WITH c AS (SELECT l_orderkey AS key, count(*) AS cnt
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
       |  max(cnt) AS max_cnt FROM c),
       |h AS (SELECT key, cnt,
       |  CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT) AS rank
       |  FROM c ORDER BY cnt DESC, key LIMIT ${Olap.SkewTopK})
       |SELECT h.rank, h.key, h.cnt, t.n_keys, t.n_rows, t.max_cnt
       |FROM h, t""".stripMargin

  /** twin of [[graft.operators.Olap.madByGroup]]: lower-median rank
    * pick in both phases, med broadcast back via join. */
  val madByGroup: String =
    s"""WITH $cents,
       |r1 AS (SELECT l_returnflag, cents,
       |  row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
       |  count(*) OVER (PARTITION BY l_returnflag) AS cnt FROM x),
       |med AS (SELECT l_returnflag,
       |  max(CASE WHEN rn = (cnt - 1) // 2 + 1 THEN cents END) AS med_cents
       |FROM r1 GROUP BY l_returnflag),
       |d AS (SELECT x.l_returnflag, abs(x.cents - m.med_cents) AS dev
       |  FROM x JOIN med m USING (l_returnflag)),
       |r2 AS (SELECT l_returnflag, dev,
       |  row_number() OVER (PARTITION BY l_returnflag ORDER BY dev) AS rn,
       |  count(*) OVER (PARTITION BY l_returnflag) AS cnt FROM d),
       |mad AS (SELECT l_returnflag, CAST(max(cnt) AS BIGINT) AS n,
       |  max(CASE WHEN rn = (cnt - 1) // 2 + 1 THEN dev END) AS mad_cents
       |FROM r2 GROUP BY l_returnflag)
       |SELECT mad.l_returnflag, mad.n, mad.mad_cents, med.med_cents
       |FROM mad JOIN med USING (l_returnflag)""".stripMargin
}
