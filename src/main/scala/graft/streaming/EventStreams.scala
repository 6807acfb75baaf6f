package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.sources.Tpch

/** Streaming / CDC surface (SURVEY.md §2.5): the events table plays the
  * reference's transaction log (txId-ordered change stream —
  * com/.../TransactionStream.java:31-70). Each operator has a batch
  * twin (oracle-checked) and a Structured Streaming form (tested with
  * file-source micro-batches in EventStreamsSpec):
  *
  *  - [[hourlyAgg]]: event-time tumbling window aggregation (the
  *    windowed extension mandated by the north star; watermarked in
  *    streaming form);
  *  - [[userState]]: the replayed per-key state of the log — what the
  *    reference's log replay builds (S7, BackupService
  *    incrementalWithContext:383-475);
  *  - [[sessionize]]: 30-min-gap session windows per user (event-time
  *    session semantics);
  *  - [[mergeStates]]: the MERGE operator for snapshot+increment — the
  *    incremental-backup apply step; [[incrementalEquivalence]] proves
  *    snapshot(≤W) ⊕ increment(>W) ≡ full replay, the reference's
  *    full-then-incremental backup lifecycle
  *    (backup/.../TestBackup.java:220 fullThenIncremental);
  *  - exactly-once bookkeeping: state carries last_event_id — the
  *    last-applied-txId watermark of RequestContext.java:33-64.
  *
  * Monetary values are quantized to cents (BIGINT) so every sum is
  * order-independent and the DuckDB twins match bit-exactly.
  */
object EventStreams {
  val SessionGapMicros: Long = 1800L * 1000000L

  /** The corpus stores ts as TIMESTAMP(NANOS), which Spark only reads
    * as LongType under spark.sql.legacy.parquet.nanosAsLong — normalize
    * to a micros timestamp (floor division, matching the oracle's
    * nanos→micros truncation). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tpch.table(spark, dir, "events")
    val withTs = raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) parquet read as long under nanosAsLong
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // timestamp[us] without isAdjustedToUTC reads as TIMESTAMP_NTZ,
      // which watermarks/unix_micros reject. The NTZ→TIMESTAMP cast is
      // wall-clock preserving ONLY under session tz UTC — repo-owned
      // sessions pin it, but SparkEntry also runs under the external
      // driver's session, so force it here (runtime-settable conf;
      // idempotent) rather than silently shift every event-time query
      // under a non-UTC ambient tz. The corpus NTZ values are UTC wall
      // clocks, matching the tz-naive DuckDB oracle.
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        if (spark.conf.get("spark.sql.session.timeZone") != "UTC")
          spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
    withTs.withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
  }

  /** Trending top-[[TrendingK]] event types per 6-hour window — the
    * windowed heavy-hitter report a monitoring dashboard polls. The
    * window id is integer epoch-seconds div 21600 (engine-exact, no
    * timezone/bucketing library in the loop); per-window ranking is a
    * partition-local sort over ≤ |event types| rows. One partial-agg
    * groupBy + one tiny window pass at any stream length. */
  val TrendingK = 3
  val TrendingWinSec = 21600L
  def trending(ev: DataFrame): DataFrame = {
    val counts = ev
      .select(expr(s"(unix_micros(ts) div 1000000) div $TrendingWinSec").as("win"),
        col("event_type"))
      .groupBy("win", "event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("win").orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TrendingK)
  }

  /** Cohort lifetime-value report — the subscription-analytics staple:
    * users are grouped by the WEEK of their first event (cohort; the
    * corpus spans ~a month, so weeks give a real grid), and revenue
    * accumulates per cohort over week age. Week ids are pure integer
    * epoch-days div 7, the cumulative sum is a window over the (tiny)
    * cohort×age grid, and the heavy part — first-event week per
    * user — is one partial-aggregable min. Complements `s_retention`
    * (activity) with value. */
  def cohortLtv(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"), col("cents"),
      expr(s"(unix_micros(ts) div ${86400L * 1000000L}) div 7").as("ew"))
    val firsts = e.groupBy("user_id").agg(min("ew").as("cohort"))
    val aged = e.join(firsts, "user_id")
      .withColumn("age_weeks", col("ew") - col("cohort"))
    val grid = aged.groupBy("cohort", "age_weeks")
      .agg(count_distinct(col("user_id")).as("n_users"),
        sum("cents").as("revenue_cents"))
    val w = Window.partitionBy("cohort").orderBy("age_weeks")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum_revenue_cents", sum("revenue_cents").over(w))
  }

  /** [[scd2]] materializes history for 1-in-[[Scd2UserMod]] users (the
    * full version table at sf0.01 is the whole event stream's runs;
    * the slice keeps the oracle row count proportionate — the operator
    * itself is per-user-linear). */
  val Scd2UserMod = 10L

  /** Slowly-changing-dimension (type 2) build — the warehouse
    * dimension-history op: each run of equal consecutive states per
    * user becomes a version row [valid_from, valid_to), the open
    * version carrying −1. One lag window detects changes, one lead
    * window closes intervals — two passes over the SAME (user, time)
    * partitioning, so the exchange is paid once. Versions are integer
    * micros; no floats. At 100 TB this is the standard
    * "compact events into dimension history" job, and the plan is the
    * one you want: partition by the dimension key, window locally,
    * never a global sort. */
  def scd2(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val changes = ev.filter(pmod(col("user_id"), lit(Scd2UserMod)) === 0)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    val w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    changes
      .withColumn("version", row_number().over(w2).cast("long"))
      .withColumn("valid_to_us",
        coalesce(lead("us", 1).over(w2), lit(-1L)))
      .select(col("user_id"), col("version"), col("event_type").as("state"),
        col("us").as("valid_from_us"), col("valid_to_us"))
  }

  /** Per-event modeled ingestion delay bound: the corpus carries no
    * ingestion timestamp, so arrival = event time + (mixed hash of
    * event_id mod 2 h) — a deterministic stand-in with the statistics
    * of network/batching delay. On a real stream, replace `arr_us`
    * with the ingestion column; everything else is unchanged. */
  val LateMaxJitterUs = 7200000000L

  /** Out-of-orderness audit — the measurement that SIZES a watermark.
    * Events are replayed in arrival order per user; an event is late
    * by (running-max event time − its event time). The report buckets
    * that lateness (on-time / <1m / <1h / <6h / ≥6h) with counts and
    * the bucket's worst case: exactly the "what delay covers 99.9% of
    * events" table you read before choosing `withWatermark`. One
    * per-user window pass (arrival replay) + one tiny groupBy — the
    * same cost as sessionize, and integer-exact on both engines. */
  def lateness(ev: DataFrame): DataFrame = {
    val arr = expr("unix_micros(ts)") +
      pmod(graft.operators.Sketch.mixPub(
        pmod(col("event_id"), lit(graft.operators.Sketch.HashMod))),
        lit(LateMaxJitterUs))
    val w = Window.partitionBy("user_id").orderBy("arr_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), arr.as("arr_us"))
      .withColumn("late_us", max("us").over(w) - col("us"))
      .withColumn("bucket",
        when(col("late_us") === 0L, "a_on_time")
          .when(col("late_us") < 60L * 1000000L, "b_lt_1m")
          .when(col("late_us") < 3600L * 1000000L, "c_lt_1h")
          .when(col("late_us") < 6L * 3600L * 1000000L, "d_lt_6h")
          .otherwise("e_ge_6h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"), max("late_us").as("max_late_us"))
  }

  /** Exponential time-decay scoring — the recency weighting every
    * feed-ranking / trending-content pipeline applies before anything
    * else, in ENGINE-EXACT integer arithmetic: value halves per
    * [[DecayHalfLifeHours]]-hour age bucket via a right shift
    * (floor-of-powers-of-two decay), so there is no pow()/exp() float
    * for the engines to disagree on. The anchor (newest event hour) is
    * a one-row aggregate broadcast against the scan; the score is then
    * a single partial-aggregable groupBy — decayed values sum
    * map-side, and two shards scored independently merge by addition,
    * which is what makes the metric maintainable incrementally at
    * stream scale (new batch: shift the old total by the elapsed
    * buckets, add the new). Shifts are capped at [[DecayMaxShift]]:
    * Java's `>>` masks the shift amount mod 64, so an uncapped
    * 83-hour-bucket age would silently wrap on the Spark side while
    * DuckDB zeroes — the CASE keeps both engines at exactly 0. */
  val DecayHalfLifeHours = 24L
  val DecayMaxShift = 40L
  def decayScore(ev: DataFrame): DataFrame = {
    val e = ev.select(col("event_type"), col("cents"),
      expr("unix_micros(ts) div 3600000000").as("hr"))
    val anchor = e.agg(max("hr").as("mx"))
    e.crossJoin(broadcast(anchor))
      .withColumn("age_b", expr(s"(mx - hr) div $DecayHalfLifeHours"))
      .withColumn("decayed", expr(
        s"CASE WHEN age_b >= $DecayMaxShift THEN CAST(0 AS BIGINT) " +
          "ELSE shiftright(cents, CAST(age_b AS INT)) END"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("cents").as("raw_cents"),
        sum("decayed").as("decayed_cents"))
  }

  /** Distinct users per hour — but as the SKETCH a dashboard actually
    * serves at scale: an exact hourly `count(DISTINCT user_id)` is a
    * full re-shuffle of the stream per window, while HLL registers
    * keyed (hour, bucket) are one partial-aggregable pass
    * ([[graft.operators.Sketch.hllDistinctBy]]) whose per-window state
    * is a constant 256 integers. Registers merge by max — associative
    * and idempotent — so late/duplicate events fold in without
    * correction terms; a streaming variant would carry the same
    * (win, bucket, max rho) state under a watermark. Window id is
    * integer epoch-hour (same engine-exact arithmetic as [[trending]]).
    * Output (win, m, z, est, exact) quantifies its own error like
    * every sketch probe here. */
  def windowedDistinct(ev: DataFrame): DataFrame =
    graft.operators.Sketch.hllDistinctBy(
      ev.select(expr("(unix_micros(ts) div 1000000) div 3600").as("win"),
        col("user_id")),
      "win", "user_id")
      .withColumnRenamed("grp", "win")

  /** Tumbling 1-hour window per event type (batch twin). */
  def hourlyAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_cents"))

  /** Streaming form: watermarked event-time aggregation. */
  def hourlyAggStream(src: DataFrame): DataFrame =
    src.withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_cents"))

  /** Event transition matrix: per user, order by event time and count
    * each consecutive (prev_type → type) step — the funnel/markov
    * primitive of product analytics. One window pass partitioned by
    * user (partition-local sort, no global order) feeding a
    * partial-aggregable count — two exchanges total at any scale.
    * Event times are unique per user in this corpus; event_id breaks
    * any tie deterministically. */
  def transitions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Semi-structured projection: parse the JSON `props` payload and
    * aggregate the extracted field per event type. The JSON path
    * evaluation (`get_json_object`) runs inside whole-stage codegen —
    * the scan-adjacent parse every telemetry pipeline does before the
    * first shuffle, so only (type, k) longs cross the exchange. */
  def propStats(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))

  /** Semi-structured props via Spark 4's VARIANT type — the
    * heterogeneous-value property surface (SURVEY §1.6's tagged-union
    * struct) done the engine-native way: `parse_json` ONCE into a
    * binary variant, then N typed `variant_get` extractions off that
    * single parse (here bigint and string views of the same field,
    * bucketed). Versus per-field `get_json_object` re-parsing the text
    * N times, the variant parse amortizes across extractions — the
    * shape that matters when a 100 TB corpus carries wide
    * semi-structured payloads. Whole thing is one codegen projection +
    * one partial-agg groupBy. */
  def propStatsVariant(ev: DataFrame): DataFrame =
    ev.select(col("event_type"), expr("parse_json(props)").as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.k', 'string')").as("ks"))
      .groupBy(col("event_type"), (col("k") - pmod(col("k"), lit(10L)))
        .divide(lit(10L)).cast("long").as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        max("ks").as("max_k_str"))

  /** Cohort retention: users grouped by the week of their first event,
    * then counted as active per (cohort, week offset) — the
    * product-analytics staple. Two partial-aggregable passes (first
    * event per user, then distinct users per cell); week arithmetic is
    * integer day-diffs over Monday-truncated dates, so both engines
    * agree exactly. */
  def retention(ev: DataFrame): DataFrame = {
    val firstWeek = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cohort_week"))
    ev.select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .join(firstWeek, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Three-stage funnel: per user, the earliest view, the earliest
    * click strictly after it, the earliest purchase strictly after
    * that — reported as per-stage completion counts. Three conditional
    * min-aggregations all keyed on user_id (co-partitioned, the
    * exchanges collapse to one), strict event-time ordering so a
    * click before any view does not count. */
  def funnel(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"), col("ts"), col("event_type"))
    val t1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val users = e.select("user_id").distinct()
    users.join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_users"),
        count(col("t1")).as("n_viewed"),
        count(col("t2")).as("n_clicked_after"),
        count(col("t3")).as("n_purchased_after"))
  }

  /** Last-touch revenue attribution — the marketing-analytics staple:
    * every purchase's cents are credited to the nearest PRECEDING
    * non-purchase event (the "touch") of the same user; purchases with
    * no prior touch credit the `direct` channel. One pass: a per-user
    * ordered window carries the last touch forward (`last` with
    * ignoreNulls over rows (-∞, -1)), so no self-join of purchases
    * against touches — at 100 TB this is one shuffle on user_id and a
    * sorted within-partition sweep, identical in shape to
    * [[sessionize]]. Ordering ties break on event_id, matching every
    * other event-order contract in this file. */
  def attribution(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("touch",
        when(col("event_type") =!= "purchase", col("event_type")))
      .withColumn("last_touch", last("touch", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum("cents").as("cents_total"))
  }

  final case class TransEv(user_id: Long, ts: java.sql.Timestamp,
    event_id: Long, event_type: String)
  final case class TransLast(tsMs: Long, id: Long, tpe: String)
  final case class TransOut(user_id: Long, from_type: String, to_type: String)

  /** Streaming form of [[transitions]]: keyed state holds each user's
    * last event; every arriving batch sorts its in-batch slice by
    * (ts, event_id), bridges from the remembered last event, and emits
    * one (from → to) row per consecutive pair. State per key is ONE
    * event — constant regardless of stream length. Assumes per-user
    * in-order delivery across batches (the watermark bounds the
    * disorder a source may replay); the batch twin `transitions` is
    * the oracle-gated semantics.
    *
    * AGGREGATE state is bounded by `idleGapMs`: a user idle (in event
    * time) longer than the gap has their state expired via
    * EventTimeTimeout, so total state tracks ACTIVE keys, not all keys
    * ever seen. The trade is explicit: a user returning after ≥ gap is
    * treated as fresh — the one transition bridging the gap is not
    * emitted. The default (`Long.MaxValue`) never expires: exact
    * semantics, state linear in user cardinality — callers with
    * unbounded key churn must pass a finite gap. */
  def transitionsStream(src: DataFrame,
      idleGapMs: Long = Long.MaxValue): Dataset[TransOut] = {
    val ss = src.sparkSession
    import ss.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    src.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withWatermark("ts", "2 hours")
      .as[TransEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[TransEv], state: GroupState[TransLast]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            if (sorted.isEmpty) Iterator.empty
            else {
              val out = Seq.newBuilder[TransOut]
              var last = state.getOption.orNull
              sorted.foreach { e =>
                if (last != null)
                  out += TransOut(uid, last.tpe, e.event_type)
                last = TransLast(e.ts.getTime, e.event_id, e.event_type)
              }
              state.update(last)
              if (idleGapMs != Long.MaxValue) {
                // a timeout must sit beyond the current watermark
                val floor = state.getCurrentWatermarkMs() + 1
                val expire = last.tsMs + idleGapMs // saturating
                state.setTimeoutTimestamp(
                  math.max(if (expire < last.tsMs) Long.MaxValue else expire,
                    floor))
              }
              out.result().iterator
            }
          }
      }
  }

  /** Replayed per-user state: event counts, cent totals, and the last
    * event by (ts, event_id) — the exactly-once bookmark. */
  def userState(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("cents").as("total_cents"),
        max(when(col("rn") === 1, col("event_type"))).as("last_type"),
        max(when(col("rn") === 1, col("ts"))).as("last_ts"),
        max(when(col("rn") === 1, col("event_id"))).as("last_event_id"))
  }

  /** MERGE of two states (snapshot ⊕ increment): counts/totals add, the
    * later (last_ts, last_event_id) wins — S7 log-replay apply. */
  def mergeStates(snap: DataFrame, inc: DataFrame): DataFrame = {
    val a = snap.select(col("user_id"), col("n_events").as("a_n"),
      col("total_cents").as("a_t"), col("last_type").as("a_lt"),
      col("last_ts").as("a_ts"), col("last_event_id").as("a_id"))
    val b = inc.select(col("user_id"), col("n_events").as("b_n"),
      col("total_cents").as("b_t"), col("last_type").as("b_lt"),
      col("last_ts").as("b_ts"), col("last_event_id").as("b_id"))
    val incWins = col("b_id").isNotNull &&
      (col("a_id").isNull ||
        col("b_ts") > col("a_ts") ||
        (col("b_ts") === col("a_ts") && col("b_id") > col("a_id")))
    a.join(b, Seq("user_id"), "full")
      .select(col("user_id"),
        (coalesce(col("a_n"), lit(0L)) + coalesce(col("b_n"), lit(0L))).as("n_events"),
        (coalesce(col("a_t"), lit(0L)) + coalesce(col("b_t"), lit(0L))).as("total_cents"),
        when(incWins, col("b_lt")).otherwise(col("a_lt")).as("last_type"),
        when(incWins, col("b_ts")).otherwise(col("a_ts")).as("last_ts"),
        when(incWins, col("b_id")).otherwise(col("a_id")).as("last_event_id"))
  }

  /** Snapshot at watermark W = max(event_id)/2, increment after W,
    * merged — the oracle compares this against a direct full replay, so
    * the correctness gate itself proves the backup lifecycle. */
  def incrementalEquivalence(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val w = ev.agg(expr("CAST(max(event_id) div 2 AS BIGINT)")).head().getLong(0)
    mergeStates(
      userState(ev.filter(col("event_id") <= w)),
      userState(ev.filter(col("event_id") > w)))
  }

  /** Interval-join window: clicks within the hour before a purchase. */
  val JoinWindowMicros: Long = 3600L * 1000000L

  /** Stream-stream interval join, batch twin: every purchase joined to
    * the same user's clicks in the preceding hour (count + latest click
    * id; purchases with no clicks survive with n=0). One shuffle keyed
    * by user with the time predicate applied inside the key group —
    * the batch shape of Spark's watermarked interval join, whose state
    * is bounded by watermark + interval at any stream rate. */
  def purchaseClicks(ev: DataFrame): DataFrame = {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        expr("unix_micros(ts)").as("pus"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        expr("unix_micros(ts)").as("cus"))
    p.join(c, col("user_id") === col("cu") &&
        col("cus") >= col("pus") - JoinWindowMicros && col("cus") <= col("pus"),
        "left")
      .groupBy("purchase_id", "user_id")
      .agg(count(col("click_id")).as("n_clicks_1h"),
        max(col("click_id")).as("last_click_id"))
  }

  /** Streaming form: watermarked stream-stream interval join (inner;
    * the pairs are compared against the batch twin's inner pairs in
    * EventStreamsSpec). Both sides carry a 2-hour watermark, so join
    * state for a click is dropped once the purchase-side watermark
    * passes click_ts + 1 hour. */
  def purchaseClicksStream(src: DataFrame): DataFrame = {
    val p = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val c = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(c, expr(
      "p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"))
  }

  final case class EvRow(event_id: Long, user_id: Long, cents: Long)
  final case class UserAgg(n: Long, total: Long, lastId: Long)

  /** Custom keyed state via mapGroupsWithState: running per-user
    * totals, the T2/T3 interceptor-style stateful pass (streaming form
    * runs in Update mode; batch form processes one group per key). */
  def runningTotals(src: Dataset[EvRow]): Dataset[(Long, UserAgg)] = {
    import src.sparkSession.implicits._
    src.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[EvRow], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(0L, 0L, -1L))
          val next = evs.foldLeft(prev) { (acc, e) =>
            UserAgg(acc.n + 1, acc.total + e.cents, math.max(acc.lastId, e.event_id))
          }
          state.update(next)
          (uid, next)
      }
  }

  /** Running per-user totals on the NEW arbitrary-state API
    * (`transformWithState`, Spark 4): the [[runningTotals]] semantics
    * re-expressed as a [[TotalsProcessor]] with an explicit
    * [[org.apache.spark.sql.streaming.ValueState]]. The new API is
    * where stateful Spark is heading — typed state handles, per-state
    * TTL, timers — and it requires the RocksDB state store (disk-backed
    * state = the 100 TB keyed-state story; the HDFS-backed default
    * holds every key in executor heap). TransformWithStateSpec proves
    * it equal to the batch aggregate across restarts. */
  case class UserTotal(user_id: Long, n_events: Long, total_cents: Long)

  class TotalsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), UserTotal] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[UserTotal] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserTotal]("totals",
        org.apache.spark.sql.Encoders.product[UserTotal],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotal] = {
      val prev = if (totals.exists()) totals.get() else UserTotal(key, 0L, 0L)
      val cur = rows.foldLeft(prev) { (acc, r) =>
        UserTotal(key, acc.n_events + 1, acc.total_cents + r._2)
      }
      totals.update(cur)
      Iterator.single(cur)
    }
  }

  def runningTotalsTws(ev: DataFrame): Dataset[UserTotal] = {
    import ev.sparkSession.implicits._
    ev.select(col("user_id"), col("cents")).as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Streaming exactly-once dedup: drop re-delivered events by
    * event_id inside the watermark horizon — the at-least-once →
    * exactly-once repair every CDC/log consumer runs first. State is
    * bounded by the watermark (an id older than the horizon cannot be
    * re-delivered by a source replaying from the last committed
    * offset), which is what makes this shape safe at any stream
    * length — a plain dropDuplicates would accumulate ids forever. */
  def dedupStream(src: DataFrame): DataFrame =
    src.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  final case class SessEv(user_id: Long, ts: java.sql.Timestamp, cents: Long)
  final case class SessRunning(startMs: Long, lastMs: Long, n: Long,
    total: Long, idx: Long)
  final case class SessOut(user_id: Long, session_idx: Long,
    session_start: java.sql.Timestamp, n_events: Long, total_cents: Long)

  /** Streaming sessionization — the custom-state form of [[sessionize]]
    * via flatMapGroupsWithState + EventTimeTimeout: per-user open
    * sessions live in keyed state, extend on in-gap events, close
    * (emit) on a >30-min gap within a batch or when the watermark
    * passes last_event + gap (the timeout path). State per key is one
    * running session — bounded regardless of stream length; emitted
    * rows match the batch twin's (session_idx, start, n, total). */
  def sessionizeStream(src: DataFrame): Dataset[SessOut] = {
    val ss = src.sparkSession
    import ss.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val gapMs = SessionGapMicros / 1000L
    src.select(col("user_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withWatermark("ts", "2 hours")
      .as[SessEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[SessEv], state: GroupState[SessRunning]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessOut(uid, s.idx,
              new java.sql.Timestamp(s.startMs), s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.cents))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer[SessOut]()
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs > gapMs =>
                  out += SessOut(uid, s.idx,
                    new java.sql.Timestamp(s.startMs), s.n, s.total)
                  cur = Some(SessRunning(t, t, 1L, e.cents, s.idx + 1))
                case Some(s) =>
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, t),
                    n = s.n + 1, total = s.total + e.cents))
                case None =>
                  cur = Some(SessRunning(t, t, 1L, e.cents, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            out.iterator
          }
      }
  }

  /** Session windows: a new session starts after a >30-min gap; output
    * one row per (user, session). */
  def sessionize(ev: DataFrame): DataFrame = {
    val wu = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag("us", 1).over(wu))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > SessionGapMicros, 1L).otherwise(0L))
      .withColumn("sess", sum("brk").over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"),
        sum("cents").as("total_cents"))
      .select(col("user_id"), col("sess").as("session_idx"),
        col("session_start"), col("n_events"), col("total_cents"))
  }
}
