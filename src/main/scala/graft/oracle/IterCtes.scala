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

  /** twin of [[graft.operators.Iterative.coreness]]: cascaded unrolled
    * peel levels k = 2..max (level 1 is the identity on edge
    * endpoints, replayed as a distinct), coreness = max surviving
    * level, 0 for nodes outside the edge set. MATERIALIZED like the
    * PCA rounds — each level references the previous twice. */
  val coreness: String = {
    val iters = graft.operators.Iterative.KcoreIters
    val maxK = graft.operators.Iterative.CorenessMaxK
    val rounds = (2 to maxK).flatMap { k =>
      (1 to iters).map { i =>
        val prev =
          if (i == 1) { if (k == 2) "e0" else s"e${k - 1}_$iters" }
          else s"e${k}_${i - 1}"
        s"""k${k}_$i AS MATERIALIZED (SELECT src AS node FROM $prev GROUP BY src
           |  HAVING count(*) >= $k),
           |e${k}_$i AS MATERIALIZED (SELECT e.src, e.dst FROM $prev e
           |  JOIN k${k}_$i a ON e.src = a.node
           |  JOIN k${k}_$i b ON e.dst = b.node)""".stripMargin
      }
    }.mkString(",\n")
    val survs = (2 to maxK)
      .map(k => s"SELECT DISTINCT src AS id, $k AS k FROM e${k}_$iters")
      .mkString("\nUNION ALL ")
    s"""${Ctes.graph},
       |e0 AS MATERIALIZED (SELECT src, dst FROM rels
       |  UNION ALL SELECT dst, src FROM rels),
       |$rounds,
       |alltag AS (SELECT DISTINCT src AS id, 1 AS k FROM e0
       |  UNION ALL $survs),
       |cor AS (SELECT id, CAST(max(k) AS BIGINT) AS coreness
       |  FROM alltag GROUP BY id)
       |SELECT n.kind, coalesce(c.coreness, 0) AS coreness,
       |  count(*) AS n_nodes
       |FROM nodes n LEFT JOIN cor c USING (id)
       |GROUP BY 1, 2""".stripMargin
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

  /** twin of [[graft.operators.HyperBall.hyperball]]: per-node HLL
    * registers max-merged along edges for the same unrolled rounds,
    * identical degski hash / rho cascade / exact-integer Z', top-10 by
    * (z, node), exact balls via a seed-bounded unrolled BFS. */
  val hyperball: String = {
    import graft.operators.HyperBall.{Buckets, EstNumerator, Iters, Scale, SuffixBits, TopN}
    import graft.operators.Sketch.{HashMod, MixMult}
    val caseChain = (SuffixBits to 1 by -1)
      .map(b => s"WHEN rest >= ${1L << (b - 1)} THEN $b").mkString(" ")
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS MATERIALIZED (SELECT node, bucket, max(rho) AS rho FROM (
         |  SELECT node, bucket, rho FROM r${i - 1}
         |  UNION ALL
         |  SELECT e.dst, r.bucket, r.rho
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val ballRounds = (1 to Iters).map { i =>
      s"""b$i AS MATERIALIZED (SELECT DISTINCT seed, node FROM (
         |  SELECT seed, node FROM b${i - 1}
         |  UNION ALL
         |  SELECT b.seed, e.dst FROM b${i - 1} b JOIN edges e ON b.node = e.src))""".stripMargin
    }.mkString(",\n")
    s"""${Ctes.graph},
       |edges AS MATERIALIZED (SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels),
       |h0 AS (SELECT id AS node, id % $HashMod AS h FROM nodes),
       |h1 AS (SELECT node, xor(h, h >> 16) AS h FROM h0),
       |h2 AS (SELECT node, (h * $MixMult) % $HashMod AS h FROM h1),
       |h3 AS (SELECT node, xor(h, h >> 16) AS h FROM h2),
       |h4 AS (SELECT node, (h * $MixMult) % $HashMod AS h FROM h3),
       |hh AS (SELECT node, xor(h, h >> 16) AS h FROM h4),
       |r0 AS MATERIALIZED (SELECT node, h // ${1L << SuffixBits} AS bucket,
       |  $Scale - (CASE $caseChain ELSE 0 END) AS rho
       |  FROM (SELECT node, h, h % ${1L << SuffixBits} AS rest FROM hh)),
       |$rounds,
       |z AS (SELECT node,
       |  ${Buckets.toLong << Scale} - count(*) * ${1L << Scale}
       |    + CAST(sum(CAST(1 AS BIGINT) << ($Scale - rho)) AS BIGINT) AS z
       |  FROM r$Iters GROUP BY node),
       |top AS MATERIALIZED (SELECT node, z FROM z ORDER BY z, node LIMIT $TopN),
       |b0 AS (SELECT node AS seed, node FROM top),
       |$ballRounds,
       |balls AS (SELECT seed, CAST(count(*) AS BIGINT) AS exact_ball
       |  FROM b$Iters GROUP BY seed)
       |SELECT t.node, n.kind, t.z, $EstNumerator / t.z AS est, balls.exact_ball
       |FROM top t JOIN nodes n ON t.node = n.id
       |JOIN balls ON balls.seed = t.node""".stripMargin
  }

  /** twin of [[graft.operators.HyperBall.neighborhood]]: the same
    * register rounds, z read per round over ALL nodes, per-node
    * estimates as the identical BIGINT literal floor-divided by z,
    * summed exactly; frac_of_final is the one double division. */
  val neighborhood: String = {
    import graft.operators.HyperBall.{Buckets, EstNumerator, Iters, Scale, SuffixBits}
    import graft.operators.Sketch.{HashMod, MixMult}
    val caseChain = (SuffixBits to 1 by -1)
      .map(b => s"WHEN rest >= ${1L << (b - 1)} THEN $b").mkString(" ")
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS MATERIALIZED (SELECT node, bucket, max(rho) AS rho FROM (
         |  SELECT node, bucket, rho FROM r${i - 1}
         |  UNION ALL
         |  SELECT e.dst, r.bucket, r.rho
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val estInt = EstNumerator.toLong
    val zRounds = (0 to Iters).map { t =>
      s"""z$t AS (SELECT node,
         |  ${Buckets.toLong << Scale} - count(*) * ${1L << Scale}
         |    + CAST(sum(CAST(1 AS BIGINT) << ($Scale - rho)) AS BIGINT) AS z
         |  FROM r$t GROUP BY node)""".stripMargin
    }.mkString(",\n")
    val nbhRows = (0 to Iters).map { t =>
      s"SELECT CAST($t AS BIGINT) AS t, count(*) AS n_nodes, CAST(sum($estInt // z) AS BIGINT) AS sum_est FROM z$t"
    }.mkString("\n  UNION ALL ")
    s"""${Ctes.graph},
       |edges AS MATERIALIZED (SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels),
       |h0 AS (SELECT id AS node, id % $HashMod AS h FROM nodes),
       |h1 AS (SELECT node, xor(h, h >> 16) AS h FROM h0),
       |h2 AS (SELECT node, (h * $MixMult) % $HashMod AS h FROM h1),
       |h3 AS (SELECT node, xor(h, h >> 16) AS h FROM h2),
       |h4 AS (SELECT node, (h * $MixMult) % $HashMod AS h FROM h3),
       |hh AS (SELECT node, xor(h, h >> 16) AS h FROM h4),
       |r0 AS MATERIALIZED (SELECT node, h // ${1L << SuffixBits} AS bucket,
       |  $Scale - (CASE $caseChain ELSE 0 END) AS rho
       |  FROM (SELECT node, h, h % ${1L << SuffixBits} AS rest FROM hh)),
       |$rounds,
       |$zRounds,
       |nbh AS ($nbhRows)
       |SELECT t, n_nodes, sum_est,
       |  CAST(sum_est AS DOUBLE) / (SELECT sum_est FROM nbh WHERE t = $Iters) AS frac_of_final
       |FROM nbh""".stripMargin
  }

  /** twin of [[graft.operators.GraphOps.clusteringStats]]: same
    * oriented triangle count, integer degree moments, identical
    * fixed-order double expressions. */
  val clusteringStats: String = {
    val B = Ctes.B
    val rank = graft.operators.GraphOps.RankBase
    s"""WITH li AS (
       |  SELECT ${6 * B} + l_orderkey AS o, ${5 * B} + l_partkey AS p,
       |         ${4 * B} + l_suppkey AS s FROM lineitem),
       |raw AS (
       |  SELECT o AS x, p AS y FROM li
       |  UNION ALL SELECT o, s FROM li
       |  UNION ALL SELECT p, s FROM li),
       |und AS MATERIALIZED (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw),
       |deg AS MATERIALIZED (SELECT n, count(*) AS deg FROM (
       |  SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY n),
       |ranked AS (
       |  SELECT u.a, u.b, da.deg * $rank + u.a AS ra, db.deg * $rank + u.b AS rb
       |  FROM und u JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN ra < rb THEN a ELSE b END AS u,
       |         CASE WHEN ra < rb THEN b ELSE a END AS v FROM ranked),
       |tri AS (
       |  SELECT count(*) AS n_triangles FROM o e1
       |  JOIN o e2 ON e1.v = e2.u
       |  JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v),
       |mom AS (
       |  SELECT count(*) AS n_edges,
       |    CAST(sum(da.deg + db.deg) AS BIGINT) AS sx,
       |    CAST(sum(da.deg * da.deg + db.deg * db.deg) AS BIGINT) AS sxx,
       |    CAST(sum(da.deg * db.deg) AS BIGINT) AS sxy
       |  FROM und u JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
       |wed AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
       |SELECT mom.n_edges, wed.n_wedges, tri.n_triangles,
       |  3.0 * tri.n_triangles / wed.n_wedges AS global_cc,
       |  (2.0 * mom.n_edges * mom.sxy - CAST(mom.sx AS DOUBLE) * mom.sx) /
       |  (2.0 * mom.n_edges * mom.sxx - CAST(mom.sx AS DOUBLE) * mom.sx)
       |    AS assortativity
       |FROM mom, wed, tri""".stripMargin
  }

  /** twin of [[graft.operators.Iterative.misRounds]]: same priorities
    * (degski mix × 10⁷ + node mod 10⁷), same strict-local-min rounds
    * unrolled, winners ∪ their neighbors deactivate. */
  val misRounds: String = {
    import graft.operators.Iterative.{MisIdMod, MisIters}
    import graft.operators.Sketch.{HashMod, MixMult}
    val rounds = (1 to MisIters).map { r =>
      s"""nm$r AS (SELECT e.dst AS node, min(a.p) AS minp
         |  FROM edges e JOIN a${r - 1} a ON e.src = a.node GROUP BY e.dst),
         |w$r AS MATERIALIZED (SELECT a.node FROM a${r - 1} a
         |  LEFT JOIN nm$r m ON a.node = m.node
         |  WHERE m.minp IS NULL OR a.p < m.minp),
         |rm$r AS (SELECT DISTINCT node FROM (
         |  SELECT node FROM w$r
         |  UNION ALL SELECT e.dst FROM edges e JOIN w$r w ON e.src = w.node)),
         |a$r AS MATERIALIZED (SELECT a.node, a.p FROM a${r - 1} a
         |  LEFT JOIN rm$r x ON a.node = x.node WHERE x.node IS NULL)""".stripMargin
    }.mkString(",\n")
    val misUnion = (1 to MisIters).map(r => s"SELECT node FROM w$r")
      .mkString(" UNION ALL ")
    s"""${Ctes.graph},
       |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels)),
       |h0 AS (SELECT id AS node, id % $HashMod AS h FROM nodes),
       |h1 AS (SELECT node, xor(h, h >> 16) AS h FROM h0),
       |h2 AS (SELECT node, (h * $MixMult) % $HashMod AS h FROM h1),
       |h3 AS (SELECT node, xor(h, h >> 16) AS h FROM h2),
       |h4 AS (SELECT node, (h * $MixMult) % $HashMod AS h FROM h3),
       |hh AS (SELECT node, xor(h, h >> 16) AS h FROM h4),
       |a0 AS MATERIALIZED (SELECT node, h * $MisIdMod + node % $MisIdMod AS p FROM hh),
       |$rounds,
       |mis AS ($misUnion)
       |SELECT n.kind, count(*) AS n_mis,
       |  (SELECT count(*) FROM a$MisIters) AS n_undecided
       |FROM mis JOIN nodes n ON mis.node = n.id
       |GROUP BY n.kind""".stripMargin
  }

  /** twin of [[graft.operators.GraphOps.ktruss]]: unrolled peel
    * rounds over the 1995 part co-purchase graph, each the oriented
    * triangle enumeration + 3-edge explode + support filter;
    * orientation packs (deg, id) into one BIGINT (sound at oracle
    * scale, see GraphOps.RankBase). Output is the per-round peel
    * curve. */
  val ktruss: String = {
    import graft.operators.GraphOps.{RankBase, TrussCutoff, TrussIters, TrussK}
    val rounds = (1 to TrussIters).map { i =>
      s"""deg$i AS (SELECT n, count(*) AS deg FROM (
         |  SELECT a AS n FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) GROUP BY n),
         |rk$i AS (SELECT e.a, e.b, da.deg * $RankBase + e.a AS ra,
         |    db.deg * $RankBase + e.b AS rb
         |  FROM e${i - 1} e JOIN deg$i da ON e.a = da.n JOIN deg$i db ON e.b = db.n),
         |o$i AS MATERIALIZED (SELECT CASE WHEN ra < rb THEN a ELSE b END AS u,
         |  CASE WHEN ra < rb THEN b ELSE a END AS v FROM rk$i),
         |tri$i AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
         |  FROM o$i e1 JOIN o$i e2 ON e1.v = e2.u
         |  JOIN o$i e3 ON e3.u = e1.u AND e3.v = e2.v),
         |supp$i AS (SELECT a, b, count(*) AS supp FROM (
         |  SELECT least(x, y) AS a, greatest(x, y) AS b FROM tri$i
         |  UNION ALL SELECT least(y, z), greatest(y, z) FROM tri$i
         |  UNION ALL SELECT least(x, z), greatest(x, z) FROM tri$i) GROUP BY 1, 2),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN supp$i s ON e.a = s.a AND e.b = s.b WHERE s.supp >= ${TrussK - 2})""".stripMargin
    }.mkString(",\n")
    val curve = (0 to TrussIters).map { t =>
      s"""SELECT $t AS round, (SELECT count(*) FROM e$t) AS n_edges,
         |  (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM (
         |    SELECT a AS id FROM e$t UNION ALL SELECT b FROM e$t)) AS n_nodes""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem WHERE l_shipdate < TIMESTAMP '$TrussCutoff'),
       |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS a, b.pk AS b
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
       |$rounds
       |$curve""".stripMargin
  }

  /** twin of [[graft.operators.HyperBall.harmonic]]: the same register
    * rounds as [[hyperball]], but z is read per round for the TopN
    * winners and the harmonic sum is the identical fixed-order double
    * expression. */
  val harmonicTop: String = {
    import graft.operators.HyperBall.{Buckets, EstNumerator, Iters, Scale, SuffixBits, TopN}
    import graft.operators.Sketch.{HashMod, MixMult}
    val caseChain = (SuffixBits to 1 by -1)
      .map(b => s"WHEN rest >= ${1L << (b - 1)} THEN $b").mkString(" ")
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS MATERIALIZED (SELECT node, bucket, max(rho) AS rho FROM (
         |  SELECT node, bucket, rho FROM r${i - 1}
         |  UNION ALL
         |  SELECT e.dst, r.bucket, r.rho
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val zRounds = (0 to Iters).map { t =>
      s"""zt$t AS (SELECT node,
         |  ${Buckets.toLong << Scale} - count(*) * ${1L << Scale}
         |    + CAST(sum(CAST(1 AS BIGINT) << ($Scale - rho)) AS BIGINT) AS z
         |  FROM r$t GROUP BY node)""".stripMargin
    }.mkString(",\n")
    val harm = (1 to Iters)
      .map(t => s"($EstNumerator / t$t.z - $EstNumerator / t${t - 1}.z) / $t.0")
      .mkString(" + ")
    val zJoins = (0 to Iters)
      .map(t => s"JOIN zt$t t$t ON t$t.node = top.node").mkString("\n")
    s"""${Ctes.graph},
       |edges AS MATERIALIZED (SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels),
       |h0 AS (SELECT id AS node, id % $HashMod AS h FROM nodes),
       |h1 AS (SELECT node, xor(h, h >> 16) AS h FROM h0),
       |h2 AS (SELECT node, (h * $MixMult) % $HashMod AS h FROM h1),
       |h3 AS (SELECT node, xor(h, h >> 16) AS h FROM h2),
       |h4 AS (SELECT node, (h * $MixMult) % $HashMod AS h FROM h3),
       |hh AS (SELECT node, xor(h, h >> 16) AS h FROM h4),
       |r0 AS MATERIALIZED (SELECT node, h // ${1L << SuffixBits} AS bucket,
       |  $Scale - (CASE $caseChain ELSE 0 END) AS rho
       |  FROM (SELECT node, h, h % ${1L << SuffixBits} AS rest FROM hh)),
       |$rounds,
       |$zRounds,
       |top AS MATERIALIZED (SELECT node, z FROM zt$Iters ORDER BY z, node LIMIT $TopN)
       |SELECT top.node, n.kind,
       |  ${(0 to Iters).map(t => s"t$t.z AS z$t").mkString(", ")},
       |  $harm AS harmonic
       |FROM top
       |$zJoins
       |JOIN nodes n ON top.node = n.id""".stripMargin
  }

  /** twin of [[graft.operators.Walks.walkVisits]]: unrolled walk steps,
    * each one the identical degski draw-hash chain (the h0..hh pattern
    * of [[hyperball]]) followed by the (node, idx = h mod deg)
    * adjacency join. */
  val randomWalks: String = {
    import graft.operators.Walks.{NumWalks, Steps}
    import graft.operators.Sketch.{HashMod, MixMult}
    val steps = (1 to Steps).map { i =>
      s"""s${i}a AS (SELECT seed, walk, node,
         |  (node * 1009 + seed * 31 + walk * 7 + $i) % $HashMod AS h FROM w${i - 1}),
         |s${i}b AS (SELECT seed, walk, node, xor(h, h >> 16) AS h FROM s${i}a),
         |s${i}c AS (SELECT seed, walk, node, (h * $MixMult) % $HashMod AS h FROM s${i}b),
         |s${i}d AS (SELECT seed, walk, node, xor(h, h >> 16) AS h FROM s${i}c),
         |s${i}e AS (SELECT seed, walk, node, (h * $MixMult) % $HashMod AS h FROM s${i}d),
         |s${i}f AS (SELECT seed, walk, node, xor(h, h >> 16) AS h FROM s${i}e),
         |w$i AS MATERIALIZED (SELECT s.seed, s.walk, a.nbr AS node
         |  FROM s${i}f s JOIN adj a ON a.node = s.node AND a.idx = s.h % a.deg)""".stripMargin
    }.mkString(",\n")
    val layers = (0 to Steps).map(i => s"SELECT $i AS step, node FROM w$i")
      .mkString("\n  UNION ALL ")
    s"""${Ctes.graph},
       |und AS (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels)),
       |adj AS MATERIALIZED (SELECT src AS node, dst AS nbr,
       |  row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
       |  count(*) OVER (PARTITION BY src) AS deg FROM und),
       |w0 AS (SELECT id AS seed, walk, id AS node
       |  FROM nodes, unnest([${(0 until NumWalks).mkString(", ")}]) AS t(walk)
       |  WHERE kind = 'customer'),
       |$steps,
       |visits AS (
       |  $layers)
       |SELECT v.step, n.kind, count(*) AS n_visits,
       |  CAST(count(DISTINCT v.node) AS BIGINT) AS n_nodes
       |FROM visits v JOIN nodes n ON v.node = n.id
       |GROUP BY 1, 2""".stripMargin
  }

  val bfsDepth: String =
    s"""${Ctes.graph},
       |edges AS (SELECT src, dst FROM rels UNION ALL SELECT dst, src FROM rels),
       |l0 AS (SELECT id AS node,
       |  CASE WHEN kind = 'region' THEN 0 ELSE $Unreachable END AS label
       |FROM nodes),
       |${unrolled(BfsIters, 1L)}
       |SELECT label AS depth, count(*) AS n_nodes FROM l$BfsIters GROUP BY label""".stripMargin

  /** twin of [[graft.operators.Scc.scc]]: because the engine runs its
    * fixpoints to convergence, the SCC partition is exact and the twin
    * may compute it ANY correct way — here reachability closure by
    * path-doubling (2^12 ≥ any path length at oracle scale; closure
    * materialization is feasible at sf0.01 only, which is exactly why
    * the engine side uses FW-BW-Trim coloring instead), then
    * scc(v) = min u with u→*v ∧ v→*u. */
  val scc: String = {
    import graft.operators.Scc.SccMod
    val doublings = 12
    val steps = (1 to doublings).map { j =>
      s"""r$j AS MATERIALIZED (SELECT s, t FROM r${j - 1}
         |  UNION SELECT x.s, y.t FROM r${j - 1} x
         |  JOIN r${j - 1} y ON x.t = y.s)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
       |  l_partkey AS pk FROM lineitem WHERE l_orderkey % $SccMod = 0),
       |e AS (SELECT DISTINCT x.pk AS src, y.pk AS dst
       |  FROM li x JOIN li y ON x.ok = y.ok AND y.ln = x.ln + 1),
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT src AS s, dst AS t FROM e UNION SELECT node, node FROM n),
       |$steps
       |SELECT fwd.t AS node, min(fwd.s) AS scc_id
       |FROM r$doublings fwd JOIN r$doublings bwd
       |  ON fwd.s = bwd.t AND fwd.t = bwd.s
       |GROUP BY fwd.t""".stripMargin
  }

  /** twin of [[graft.operators.Msf.msf]]: the same bounded Borůvka —
    * per-component argmin edge (unique packed weights), 2-cycle break
    * to the smaller id, [[graft.operators.Msf.MsfJumps]] unrolled
    * pointer-doubling steps for the contraction, rounds chained as
    * CTEs. Unique weights ⇒ the MSF is unique, so both engines must
    * produce the identical edge set round for round. */
  val msf: String = {
    import graft.operators.Msf.{AScale, E10, MsfJumps, MsfRounds, WBase}
    val rounds = (1 to MsfRounds).map { i =>
      val jumps = (1 to MsfJumps).map { j =>
        s"""p${i}_$j AS (SELECT x.c, y.p FROM p${i}_${j - 1} x
           |  JOIN p${i}_${j - 1} y ON x.p = y.c)""".stripMargin
      }.mkString(",\n")
      s"""e$i AS (SELECT c1.label AS ca, c2.label AS cb, e.wu, e.a, e.b, e.w
         |  FROM edges e JOIN comp${i - 1} c1 ON e.a = c1.node
         |  JOIN comp${i - 1} c2 ON e.b = c2.node
         |  WHERE c1.label <> c2.label),
         |cand$i AS (SELECT ca AS c, cb AS d, wu, a, b, w FROM e$i
         |  UNION ALL SELECT cb, ca, wu, a, b, w FROM e$i),
         |ch$i AS MATERIALIZED (SELECT c, d, wu, a, b, w FROM (
         |  SELECT *, row_number() OVER (PARTITION BY c ORDER BY wu) AS rn
         |  FROM cand$i) WHERE rn = 1),
         |par$i AS (SELECT x.c,
         |  CASE WHEN y.yd = x.c AND x.c < x.d THEN x.c ELSE x.d END AS p
         |  FROM ch$i x LEFT JOIN (SELECT c AS yc, d AS yd FROM ch$i) y
         |  ON x.d = y.yc),
         |allc$i AS (SELECT DISTINCT label AS c FROM comp${i - 1}),
         |p${i}_0 AS MATERIALIZED (SELECT a2.c, coalesce(par$i.p, a2.c) AS p
         |  FROM allc$i a2 LEFT JOIN par$i ON a2.c = par$i.c),
         |$jumps,
         |comp$i AS MATERIALIZED (SELECT v.node, pj.p AS label
         |  FROM comp${i - 1} v JOIN p${i}_$MsfJumps pj ON v.label = pj.c),
         |mst$i AS (SELECT DISTINCT CAST($i AS BIGINT) AS round,
         |  a AS src, b AS dst, w FROM ch$i)""".stripMargin
    }.mkString(",\n")
    val un = (1 to MsfRounds).map(i => s"SELECT * FROM mst$i")
      .mkString(" UNION ALL ")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem),
       |pe AS (SELECT x.pk AS a, y.pk AS b, count(*) AS w
       |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2),
       |edges AS MATERIALIZED (SELECT a, b, w,
       |  ($WBase - w) * $E10 + a * $AScale + b AS wu FROM pe),
       |comp0 AS MATERIALIZED (SELECT node, node AS label FROM (
       |  SELECT DISTINCT a AS node FROM edges
       |  UNION SELECT DISTINCT b FROM edges)),
       |$rounds
       |SELECT round, src, dst, CAST(w AS BIGINT) AS w FROM ($un)""".stripMargin
  }

  /** twin of [[graft.operators.HyperBall.effectiveDiameter]]: same NF
    * rows, same 0.9-crossing interpolation. */
  val effectiveDiameter: String =
    s"""WITH p AS (SELECT t, sum_est, frac_of_final,
       |    lag(frac_of_final) OVER (ORDER BY t) AS prev_frac,
       |    lag(t) OVER (ORDER BY t) AS prev_t
       |  FROM ($neighborhood) nf0)
       |SELECT t AS t90,
       |  CASE WHEN prev_frac IS NULL THEN CAST(t AS DOUBLE)
       |       ELSE prev_t + (0.9 - prev_frac) / (frac_of_final - prev_frac)
       |  END AS d_eff_90,
       |  sum_est AS nf_at_t90
       |FROM p WHERE frac_of_final >= 0.9 ORDER BY t LIMIT 1""".stripMargin
}
