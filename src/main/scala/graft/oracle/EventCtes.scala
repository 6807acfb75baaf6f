package graft.oracle

/** DuckDB twins of [[graft.streaming.EventStreams]] batch forms.
  * `cdc_incremental`'s oracle is deliberately the DIRECT full replay —
  * the hash compare itself proves snapshot ⊕ increment ≡ replay. */
object EventCtes {
  private val ev =
    "ev AS (SELECT *, CAST(round(value * 100) AS BIGINT) AS cents FROM events)"

  val hourlyAgg: String =
    s"""WITH $ev
       |SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
       |  CAST(sum(cents) AS BIGINT) AS total_cents
       |FROM ev GROUP BY 1, 2""".stripMargin

  val userState: String =
    s"""WITH $ev,
       |r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
       |SELECT user_id, count(*) AS n_events,
       |  CAST(sum(cents) AS BIGINT) AS total_cents,
       |  max(CASE WHEN rn = 1 THEN event_type END) AS last_type,
       |  max(CASE WHEN rn = 1 THEN ts END) AS last_ts,
       |  max(CASE WHEN rn = 1 THEN event_id END) AS last_event_id
       |FROM r GROUP BY user_id""".stripMargin

  /** twin of EventStreams.transitions: lag window per user, count
    * consecutive (prev → curr) event-type steps */
  val transitions: String =
    s"""WITH r AS (
       |  SELECT event_type,
       |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS prev_type
       |  FROM events)
       |SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
       |FROM r WHERE prev_type IS NOT NULL
       |GROUP BY 1, 2""".stripMargin

  /** twin of EventStreams.attribution: last preceding non-purchase
    * touch per purchase via IGNORE NULLS window, `direct` fallback */
  val attribution: String =
    s"""WITH $ev,
       |r AS (
       |  SELECT event_type, cents,
       |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
       |        IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS last_touch
       |  FROM ev)
       |SELECT coalesce(last_touch, 'direct') AS channel,
       |  count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS cents_total
       |FROM r WHERE event_type = 'purchase'
       |GROUP BY 1""".stripMargin

  /** twin of EventStreams.propStats: JSON field extraction + per-type
    * aggregate */
  val propStats: String =
    s"""WITH x AS (
       |  SELECT event_type,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
       |  FROM events)
       |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       |  min(k) AS min_k, max(k) AS max_k
       |FROM x GROUP BY event_type""".stripMargin

  /** twin of EventStreams.propStatsVariant: typed bigint + string
    * extraction of the same JSON field, decile-bucketed aggregate.
    * The bucket is explicit floor-division (k − pmod)/10 — exactly
    * divisible, so // truncation vs floor agree on both engines even
    * for negative k. */
  val propStatsVariant: String =
    s"""WITH x AS (
       |  SELECT event_type,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
       |    json_extract_string(props, '$$.k') AS ks
       |  FROM events)
       |SELECT event_type,
       |  (k - ((k % 10) + 10) % 10) // 10 AS k_bucket,
       |  count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       |  max(ks) AS max_k_str
       |FROM x GROUP BY 1, 2""".stripMargin

  /** twin of EventStreams.retention: first-event cohort week × week
    * offset × distinct active users */
  val retention: String =
    s"""WITH fw AS (
       |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
       |  FROM events GROUP BY user_id),
       |x AS (
       |  SELECT e.user_id, fw.cohort_week,
       |    date_diff('day', fw.cohort_week, date_trunc('week', e.ts)) // 7
       |      AS week_offset
       |  FROM events e JOIN fw ON e.user_id = fw.user_id)
       |SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       |FROM x GROUP BY 1, 2""".stripMargin

  /** twin of AsOfJoin.purchaseLastClick: same tagged-union-window
    * construction (portable ≤-with-tiebreak semantics, rather than
    * DuckDB's native ASOF JOIN whose tie rules could differ). */
  val asofJoin: String =
    s"""WITH $ev,
       |evu AS (SELECT *, epoch_us(ts) AS us FROM ev),
       |tagged AS (
       |  SELECT user_id AS key, us AS tss, event_id AS id, 0 AS tag
       |  FROM evu WHERE event_type = 'click'
       |  UNION ALL
       |  SELECT user_id, us, event_id, 1 FROM evu WHERE event_type = 'purchase'),
       |marked AS (
       |  SELECT *, last_value(CASE WHEN tag = 0 THEN id END IGNORE NULLS)
       |    OVER (PARTITION BY key ORDER BY tss, tag, id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_id
       |  FROM tagged),
       |clicks AS (SELECT event_id, epoch_us(ts) AS click_us FROM evu WHERE event_type = 'click')
       |SELECT m.id AS purchase_id, m.key AS user_id, m.asof_id AS last_click_id,
       |  m.tss - c.click_us AS gap_us
       |FROM marked m LEFT JOIN clicks c ON m.asof_id = c.event_id
       |WHERE m.tag = 1""".stripMargin

  /** twin of EventStreams.purchaseClicks (stream-stream interval join,
    * batch form) */
  val intervalJoin: String =
    s"""WITH $ev,
       |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
       |  FROM ev WHERE event_type = 'purchase'),
       |c AS (SELECT user_id AS cu, event_id AS click_id, epoch_us(ts) AS cus
       |  FROM ev WHERE event_type = 'click')
       |SELECT p.purchase_id, p.user_id,
       |  count(c.click_id) AS n_clicks_1h,
       |  max(c.click_id) AS last_click_id
       |FROM p LEFT JOIN c ON p.user_id = c.cu
       |  AND c.cus >= p.pus - 3600000000 AND c.cus <= p.pus
       |GROUP BY 1, 2""".stripMargin

  /** twin of EventStreams.trending: integer epoch-second window ids,
    * per-window rank by (count desc, type) */
  val trending: String = {
    val k = graft.streaming.EventStreams.TrendingK
    val win = graft.streaming.EventStreams.TrendingWinSec
    s"""WITH $ev,
       |c AS (SELECT (epoch_us(ts) // 1000000) // $win AS win, event_type FROM ev),
       |g AS (SELECT win, event_type, CAST(count(*) AS BIGINT) AS n
       |  FROM c GROUP BY 1, 2),
       |r AS (SELECT win, event_type, n,
       |  CAST(row_number() OVER (PARTITION BY win
       |    ORDER BY n DESC, event_type) AS BIGINT) AS rnk FROM g)
       |SELECT win, event_type, n, rnk FROM r WHERE rnk <= $k""".stripMargin
  }

  /** twin of EventStreams.cohortLtv: integer epoch-week ids,
    * cumulative window over the cohort×age grid. */
  val cohortLtv: String =
    s"""WITH $ev,
       |e AS (SELECT user_id, cents,
       |  (epoch_us(ts) // ${86400L * 1000000L}) // 7 AS ew FROM ev),
       |f AS (SELECT user_id, min(ew) AS cohort FROM e GROUP BY user_id),
       |aged AS (SELECT e.user_id, e.cents, f.cohort,
       |  e.ew - f.cohort AS age_weeks
       |  FROM e JOIN f ON e.user_id = f.user_id),
       |grid AS (SELECT cohort, age_weeks,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(sum(cents) AS BIGINT) AS revenue_cents
       |  FROM aged GROUP BY 1, 2)
       |SELECT cohort, age_weeks, n_users, revenue_cents,
       |  CAST(sum(revenue_cents) OVER (PARTITION BY cohort ORDER BY age_weeks
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_revenue_cents
       |FROM grid""".stripMargin

  /** twin of EventStreams.scd2: lag change detection + lead interval
    * close over the same (user, time) order; open version = −1. */
  val scd2: String = {
    val m = graft.streaming.EventStreams.Scd2UserMod
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id, ts
       |  FROM events WHERE user_id % $m = 0),
       |c AS (SELECT *, lag(event_type, 1) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM e),
       |chg AS (SELECT user_id, event_type, us, event_id FROM c
       |  WHERE prev_type IS NULL OR prev_type <> event_type)
       |SELECT user_id,
       |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT)
       |    AS version,
       |  event_type AS state, us AS valid_from_us,
       |  coalesce(lead(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id),
       |    CAST(-1 AS BIGINT)) AS valid_to_us
       |FROM chg""".stripMargin
  }

  /** twin of EventStreams.lateness: identical modeled arrival delay
    * (degski chain mod 2 h), identical arrival-replay window and
    * lateness buckets. */
  val lateness: String = {
    import graft.operators.Sketch.{HashMod, MixMult}
    val jit = graft.streaming.EventStreams.LateMaxJitterUs
    s"""WITH e0 AS (SELECT user_id, event_id, epoch_us(ts) AS us,
       |  event_id % $HashMod AS h FROM events),
       |e1 AS (SELECT * REPLACE (xor(h, h >> 16) AS h) FROM e0),
       |e2 AS (SELECT * REPLACE ((h * $MixMult) % $HashMod AS h) FROM e1),
       |e3 AS (SELECT * REPLACE (xor(h, h >> 16) AS h) FROM e2),
       |e4 AS (SELECT * REPLACE ((h * $MixMult) % $HashMod AS h) FROM e3),
       |e AS (SELECT user_id, event_id, us,
       |  us + (xor(h, h >> 16) % $jit) AS arr_us FROM e4),
       |r AS (SELECT user_id, event_id, us,
       |  max(us) OVER (PARTITION BY user_id ORDER BY arr_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us AS late_us
       |  FROM e),
       |b AS (SELECT CASE
       |    WHEN late_us = 0 THEN 'a_on_time'
       |    WHEN late_us < 60000000 THEN 'b_lt_1m'
       |    WHEN late_us < 3600000000 THEN 'c_lt_1h'
       |    WHEN late_us < 21600000000 THEN 'd_lt_6h'
       |    ELSE 'e_ge_6h' END AS bucket, late_us FROM r)
       |SELECT bucket, count(*) AS n_events, max(late_us) AS max_late_us
       |FROM b GROUP BY bucket""".stripMargin
  }

  /** twin of EventStreams.decayScore: identical hour buckets, capped
    * right-shift halving, integer sums. */
  val decayScore: String = {
    val half = graft.streaming.EventStreams.DecayHalfLifeHours
    val maxShift = graft.streaming.EventStreams.DecayMaxShift
    s"""WITH $ev,
       |e AS (SELECT event_type, cents, epoch_us(ts) // 3600000000 AS hr FROM ev),
       |mx AS (SELECT max(hr) AS mx FROM e),
       |d AS (SELECT event_type, cents, (mx - hr) // $half AS age_b FROM e, mx),
       |s AS (SELECT event_type, cents,
       |  CASE WHEN age_b >= $maxShift THEN CAST(0 AS BIGINT)
       |       ELSE cents >> age_b END AS decayed FROM d)
       |SELECT event_type, count(*) AS n_events,
       |  CAST(sum(cents) AS BIGINT) AS raw_cents,
       |  CAST(sum(decayed) AS BIGINT) AS decayed_cents
       |FROM s GROUP BY 1""".stripMargin
  }

  val sessionize: String =
    s"""WITH $ev,
       |s1 AS (SELECT *, epoch_us(ts) AS us,
       |  lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |FROM ev),
       |s2 AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk FROM s1),
       |s3 AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM s2)
       |SELECT user_id, sess AS session_idx, min(ts) AS session_start,
       |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents
       |FROM s3 GROUP BY 1, 2""".stripMargin
}
