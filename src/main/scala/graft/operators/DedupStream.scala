package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of [[Dedup.incrementalPairs]] — the per-micro-batch
  * runtime contract, shaped like [[graft.checker.DiffLatency]] (the
  * reference's per-transaction analog: every committed change is
  * checked before the commit is acknowledged,
  * checking/incremental/IncrementalDiffCheck.java:55; here every
  * arriving crawl slice is dedup-probed before it is admitted).
  *
  * The maintained index is built ONCE: the base corpus's uncapped
  * posting table (doc_id, sfp) and its df sidecar, both persisted —
  * what a production index holds. Each micro-batch ships only control
  * ids through a MemoryStream; the batch synthesizes its delta docs
  * distributedly (id-derived, no RNG), posts them, and probes:
  *
  *  - df is BASE + DELTA, capped at [[Dedup.MaxDf]] — the same "df as
  *    a maintained index would hold it" rule `dd_incremental`'s oracle
  *    proves equivalent to the batch recompute;
  *  - candidates generate from DELTA postings only (the base is
  *    probed, never self-joined), so pair work is O(delta postings ·
  *    df) per batch;
  *  - the exact-Jaccard verify touches candidates only.
  *
  * Per-batch probe cost here is one columnar pass over the cached
  * posting table with the (tiny) delta broadcast — linear in the base
  * at local[32]; a 100 TB deployment bounds that scan by sharding the
  * posting table on sfp so a delta probes only its key shards. The
  * harness reports what the contract owes: per-batch wall p50/p95/max
  * (batch 0 separate — plan + codegen warmup), planted-pair recall,
  * and zero spurious strong pairs.
  *
  * Planted truth: every even-offset delta doc is a base doc with its
  * first three tokens dropped (near-dup, Jaccard >> τ — must pair
  * with its base original); odd offsets draw from cids far outside
  * the base range (must pair with nothing).
  *
  * `runMain graft.operators.DedupStream [nBatches docsPerBatch nBase]`
  */
object DedupStream {
  /** delta ids start here — disjoint from any base id. */
  val DeltaBase = 1000000000L

  /** the id-derived delta slice for one batch: docsPerBatch docs,
    * even offsets near-duplicating base doc (batch·dpb+k) mod nBase,
    * odd offsets fresh (cid disjoint from the base generator range). */
  def deltaDocs(spark: SparkSession, batch: Long, docsPerBatch: Int,
                nBase: Long): DataFrame = {
    val ks = spark.range(docsPerBatch)
      .select((col("id") + batch * docsPerBatch).as("k"))
    // cids ≡ 9 (mod 10) have no base doc carrying their own stream
    // (the base generator redirects those ids to cid−1 as ITS planted
    // dups) — step down to cid−1 so every even delta has a base twin
    val dup = ks.filter(pmod(col("k"), lit(2L)) === 0)
      .select(col("k"), pmod(col("k"), lit(nBase)).as("cid0"))
      .select(col("k"), (col("cid0") -
        when(pmod(col("cid0"), lit(10L)) === 9L, 1L).otherwise(0L)).as("cid"))
    // regenerate the base doc's token stream from its cid (the
    // generator is a pure function of cid) and drop the first 3 tokens
    val dupText = DedupScale.textFor(dup)
      .withColumn("tt", split(col("text"), " "))
      .select((col("k") + DeltaBase).as("doc_id"),
        array_join(slice(col("tt"), lit(4),
          greatest(size(col("tt")) - 3, lit(1))), " ").as("text"))
    val fresh = ks.filter(pmod(col("k"), lit(2L)) === 1)
      .select(col("k"), (col("k") + 7 * DeltaBase).as("cid"))
    val freshText = DedupScale.textFor(fresh)
      .select((col("k") + DeltaBase).as("doc_id"), col("text"))
    dupText.unionAll(freshText)
  }

  /** the per-batch incremental probe: delta postings against the
    * persisted base index, df = base + delta capped at [[Dedup.MaxDf]]
    * (candidate keys AND scoring sizes — exactly the union df the
    * batch recompute uses, so the result is provably
    * [[Dedup.incrementalPairs]]' restricted-recompute contract;
    * `dd_stream_batch` hash-gates the equality against the SAME DuckDB
    * oracle as `dd_incremental`), exact-Jaccard verify on candidates
    * only. Per batch the cached base postings are only re-READ
    * (map-side broadcast anti/semi joins); nothing base-sized crosses
    * an exchange — a production index stores per-doc sizes and running
    * df incrementally, and here the cached columnar scans stand in for
    * those sidecars. */
  def batchPairs(baseCapped: DataFrame, baseDf: DataFrame,
                 delta: DataFrame): DataFrame = {
    // NOTE: graft.StreamBatchProf's GRAFT_SB_SUBPHASES block mirrors
    // these steps (keepDelta/overCap/collision-count) for per-phase
    // attribution — keep the two in sync when changing the shape here
    // (ADVICE r14).
    // `baseCapped` is the base posting table already filtered to
    // BASE-df ≤ MaxDf — the maintained index's steady-state capped
    // postings (what [[Dedup.nearShingles]] holds for the query path
    // and [[DedupShard.buildIndex]]'s size0 logic assumes). The
    // union-df cap then differs from the base-only cap on DELTA KEYS
    // ONLY (df never decreases), so the per-batch correction is two
    // bounded broadcast sets rather than the r13 shape's full
    // (basePost ∪ deltaPost) ⋈ keepAll exchange — the one remaining
    // base-sized shuffle of the probe (guide §2.4/§3.2: the big side
    // now never moves; every batch-variable side broadcasts).
    //  - keepDelta: delta keys whose union df stays ≤ MaxDf (probe set)
    //  - overCap:   keys the delta pushes OVER the cap — removed from
    //               the capped base by a broadcast anti-join (map-side)
    // deltaPost is PERSISTED (explode+distinct lineage, read by the df
    // sidecar, the probe, and every capped scan); handles land on
    // [[pendingBatchHandles]] — the stream loop and the memo build
    // drain after materializing each batch, and a cold-mode bypass
    // registers them for Bench's orphan drain.
    val deltaPost = Dedup.rawPostings(delta).persist()
    Seq(deltaPost).foreach { h =>
      pendingBatchHandles.add(h)
      if (graft.SessionMemo.coldMode) graft.SessionMemo.coldOrphans.add(h)
    }
    val dfDelta = deltaPost.groupBy("sfp").agg(count(lit(1)).as("dfd"))
    // base df restricted to the delta's keys: map-side semi-join over
    // the cached df sidecar, then the (small × small) outer attach
    val baseDfAtDelta = baseDf
      .join(broadcast(dfDelta.select("sfp")), "sfp")
    val dfU = dfDelta
      .join(broadcast(baseDfAtDelta), Seq("sfp"), "left")
      .select(col("sfp"), col("dfd"), coalesce(col("df"), lit(0L)).as("dfb"))
    val keepDelta = dfU.filter(col("dfd") + col("dfb") <= Dedup.MaxDf)
      .select(col("sfp"))
    // keys below the base cap but over the union cap (dfb > MaxDf keys
    // are already absent from baseCapped)
    val overCap = dfU.filter(col("dfb") <= Dedup.MaxDf &&
        col("dfd") + col("dfb") > Dedup.MaxDf)
      .select(col("sfp"))
    val probe = deltaPost.join(broadcast(keepDelta), "sfp")
    val cappedBase = baseCapped
      .join(broadcast(overCap), Seq("sfp"), "left_anti")
    val capped = cappedBase.unionAll(probe)
    // Every pair contains a DELTA doc, so a pair's shared (capped) keys
    // are all probe keys — the candidate join already enumerates the
    // FULL intersection, one collision row per shared key. Counting
    // collisions per (a, b) replaces the r13 shape's distinct +
    // two-sided re-join verify, which the r14 sub-phase profile
    // measured as the family's dominant cost (434k candidate rows
    // re-expanded against the posting table: cand 14.6 + inter 73.4 of
    // the probe's ~107 exec-s — guide §2.3 "aggregate before you
    // shuffle"). Delta↔delta pairs collide in both orientations; the
    // `is_d ⇒ x < y` guard keeps exactly one collision per shared key.
    val inter = broadcast(probe.select(col("doc_id").as("x"), col("sfp")))
      .join(cappedBase
          .select(col("doc_id").as("y"), col("sfp"), lit(false).as("is_d"))
        .unionAll(probe
          .select(col("doc_id").as("y"), col("sfp"), lit(true).as("is_d"))),
        "sfp")
      .filter(col("x") =!= col("y") && (!col("is_d") || col("x") < col("y")))
      .groupBy(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .agg(count(lit(1)).as("inter"))
    Dedup.jaccard(capped, inter)
  }

  /** Persisted per-batch intermediates of [[batchPairs]] awaiting
    * release. Looping callers drain after materializing each batch's
    * pairs so the caches never outlive their batch. */
  private val pendingBatchHandles =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Dataset[_]]

  /** Unpersist every pending per-batch intermediate (non-blocking). */
  def drainBatchHandles(): Unit = {
    var d = pendingBatchHandles.poll()
    while (d != null) {
      try { d.unpersist(false); () } catch { case _: Throwable => () }
      d = pendingBatchHandles.poll()
    }
  }

  /** Drive `nBatches` micro-batches through a foreachBatch probe;
    * returns (per-batch seconds, total pairs, planted hits, expected
    * planted). */
  def run(spark: SparkSession, nBatches: Int, docsPerBatch: Int,
          nBase: Long): (Vector[Double], Vector[Double], Long, Long, Long) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    TextOps.ensureRegistered(spark)
    // per-batch executor task time next to wall: this box swings 2-5×
    // wall under external load; task time counts work, not waiting
    val execMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            ev: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = ev.taskMetrics
          if (m != null) { execMs.addAndGet(m.executorRunTime); () }
        }
      })
    // the maintained index: built once, persisted — NOT on any batch's
    // clock. The probe side holds the CAPPED postings (batchPairs'
    // base-side contract); the uncapped df sidecar keeps the over-cap
    // keys' true counts for the union-df correction.
    val base = DedupScale.corpus(spark, nBase)
    val basePost = Dedup.rawPostings(base).persist()
    val baseDf = basePost.groupBy("sfp").agg(count(lit(1)).as("df")).persist()
    val baseCapped = basePost
      .join(baseDf.filter(col("df") <= Dedup.MaxDf).select("sfp"), "sfp")
      .persist()
    baseCapped.count()
    basePost.unpersist() // raw postings served their purpose (df + cap)
    val stream = MemoryStream[Long]
    val timings = scala.collection.mutable.ArrayBuffer[Double]()
    val execs = scala.collection.mutable.ArrayBuffer[Double]()
    var pairs = 0L
    var hits = 0L
    val q = stream.toDS().writeStream
      .foreachBatch { (batches: org.apache.spark.sql.Dataset[Long], _: Long) =>
        val ids = batches.collect().toSeq // one control id per batch
        ids.foreach { b =>
          val t0 = System.nanoTime()
          val e0 = execMs.get()
          val p = batchPairs(baseCapped, baseDf,
            deltaDocs(spark, b, docsPerBatch, nBase)).persist()
          val n = p.count()
          // planted pair: (adjusted base cid, delta id) for even offsets
          val h = p.filter(col("b") >= DeltaBase &&
            pmod(col("b") - DeltaBase, lit(2L)) === 0 &&
            col("a") === pmod(col("b") - DeltaBase, lit(nBase)) -
              when(pmod(pmod(col("b") - DeltaBase, lit(nBase)), lit(10L)) === 9L,
                1L).otherwise(0L)).count()
          p.unpersist()
          drainBatchHandles()
          timings.synchronized {
            timings += (System.nanoTime() - t0) / 1e9
            execs += (execMs.get() - e0) / 1e3
            pairs += n; hits += h
          }
        }
        ()
      }
      .start()
    try {
      var b = 0
      while (b < nBatches) {
        stream.addData(b.toLong)
        q.processAllAvailable()
        b += 1
      }
    } finally q.stop()
    baseCapped.unpersist(); baseDf.unpersist()
    // evens over the GLOBAL k range [0, nBatches·dpb): per-batch
    // ceil(dpb/2) overcounts when dpb is odd (odd batches start at an
    // odd k and hold only floor(dpb/2) evens — ADVICE r9)
    (timings.toVector, execs.toVector, pairs, hits,
      (nBatches.toLong * docsPerBatch + 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(30)
    val docsPerBatch = args.lift(1).map(_.toInt).getOrElse(200)
    val nBase = args.lift(2).map(_.toLong).getOrElse(200000L)
    val spark = LlmScale.session("DedupStream")
    val (ts, es, pairs, hits, expected) = run(spark, nBatches, docsPerBatch, nBase)
    // nBatches=1 leaves no steady batches — fall back to the first
    // batch's timing rather than indexing an empty Vector (ADVICE r9)
    def steadyOf(v: Vector[Double]) =
      { val s = v.drop(1).sorted; if (s.isEmpty) v.sorted else s }
    val steady = steadyOf(ts)
    val steadyE = steadyOf(es)
    def pctOf(v: Seq[Double], p: Double) =
      v((p * (v.size - 1)).round.toInt.min(v.size - 1))
    def pct(p: Double) = pctOf(steady, p)
    def r3(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(
      s"""{"metric":"dedup_stream","batches":$nBatches,"docs_per_batch":$docsPerBatch,""" +
      s""""n_base":$nBase,"first_batch_sec":${r3(ts.head)},""" +
      s""""p50_sec":${r3(pct(0.5))},"p95_sec":${r3(pct(0.95))},"max_sec":${r3(steady.last)},""" +
      s""""exec_p50_sec":${r3(pctOf(steadyE, 0.5))},"exec_p95_sec":${r3(pctOf(steadyE, 0.95))},""" +
      s""""pairs":$pairs,"planted_hits":$hits,"expected_planted":$expected}""")
    spark.stop()
  }
}
