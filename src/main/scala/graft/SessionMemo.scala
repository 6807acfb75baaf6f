package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for derived, usually persisted, values
  * (DataFrames, store bundles). Keyed by (session, tag); every entry
  * belonging to a session is evicted when that session's SparkContext
  * ends, so stopped sessions are not strongly referenced for the JVM
  * lifetime (long-lived processes and test suites would otherwise leak
  * one graph/store cache per session).
  *
  * Staleness contract: an entry assumes the files under its `tag`
  * (usually an sf dir) are immutable for the session's lifetime — true
  * for the driver-generated testdata. A dir whose contents change
  * requires a new session.
  *
  * Two memo layers, one class: `outputMemo = true` marks memos whose
  * value IS a query result (or a result-equivalent artifact — an
  * iterative fixpoint, a verified pair table, an ANN top-k). Those
  * honor [[SessionMemo.coldMode]]: while the flag is set, reads bypass
  * the cache and rebuild (without storing), so a benchmark can measure
  * what each query COSTS rather than what a memo read costs. The
  * default `outputMemo = false` layer — graph/store/token/shingle/
  * signature tables, the shared input surface every query family scans
  * — ignores the flag: those caches were warm in every round's
  * baseline, so bypassing them would not make numbers comparable,
  * just slow. Bypassed builds may leave orphan persisted DataFrames;
  * Spark's ContextCleaner reclaims them once unreferenced.
  */
final class SessionMemo[V](outputMemo: Boolean = false) {
  // Entries hold a lazy cell, not the value: TrieMap.getOrElseUpdate is
  // atomic on the MAP but may still evaluate a losing thread's `op`
  // side effects. Storing a cell whose body runs on first `.value`
  // force makes concurrent fills of the same tag single-evaluation —
  // the loser's unforced cell is garbage, its build never runs. This is
  // what lets SparkEntry.warm run independent fills on a thread pool
  // without double-persisting shared intermediates.
  private final class Cell(build: () => V) { lazy val value: V = build() }
  private val entries = TrieMap[(SparkSession, String), Cell]()
  private val hooked = TrieMap[SparkSession, Unit]()

  def getOrElseUpdate(spark: SparkSession, tag: String)(build: => V): V = {
    if (outputMemo) {
      SessionMemo.outputReads.incrementAndGet()
      if (SessionMemo.coldMode) {
        // UNPERSIST the stored entry first: a declarative build's plan
        // is identical to the one the memo persisted, and Spark's
        // CacheManager substitutes cached data for ANY matching
        // subplan — so without this the "rebuild" of e.g.
        // dd_incremental read its own warm cache and reported cold
        // exec 0.0 s (visible in the r9/r10-run-1 artifacts). Cold
        // semantics are "as if the result cache did not exist"; the
        // entry stays mapped (the cold pass is the session's last
        // act) and recomputes lazily if ever read again. Dataset-level
        // only, deliberately: a checkpoint-backed entry's blocks are
        // its ONLY copy (lineage truncated), so RDD-level unpersist
        // here would break any later warm read; such entries are not
        // CacheManager-registered, so the rebuild cannot alias them.
        entries.get((spark, tag)).foreach { c =>
          c.value match {
            case ds: org.apache.spark.sql.Dataset[_] =>
              try { ds.unpersist(false); () } catch { case _: Throwable => () }
            case _ =>
          }
        }
        val v = build
        // builds usually end in .persist(); the bypass stores nothing,
        // so without this the orphaned cache block lives until GC —
        // ~50 such rebuilds in one cold pass evict the warm input
        // layer and skew the very timings the pass exists for
        // (ADVICE r9). Bench unpersists after each query's sink.
        v match {
          case ds: org.apache.spark.sql.Dataset[_] =>
            SessionMemo.coldOrphans.add(ds)
          case _ =>
        }
        return v
      }
    }
    hooked.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          entries.filterInPlace { case ((s, _), _) => s ne spark }
          hooked.remove(spark)
          ()
        }
      })
    })
    entries.getOrElseUpdate((spark, tag), new Cell(() => build)).value
  }
}

object SessionMemo {
  /** While set, output-layer memos rebuild on every read instead of
    * serving the cache (input-layer memos are unaffected). Set ONLY by
    * Bench's cold pass — queries are pure, so the flag changes what is
    * measured, never what is computed. */
  @volatile var coldMode: Boolean = false

  /** Counts every read of an output-layer memo (hit or bypass). Bench
    * snapshots it around each query's timed runs to tag, from observed
    * behavior rather than a hand-kept list, which queries' steady-state
    * numbers are memo reads. */
  val outputReads = new java.util.concurrent.atomic.AtomicLong

  /** DataFrames rebuilt (and usually persisted) by a cold-mode bypass;
    * Bench drains and unpersists after each cold query so orphan cache
    * blocks cannot accumulate across the pass. */
  val coldOrphans =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Dataset[_]]

  /** Unpersist every queued cold-rebuilt frame (non-blocking).
    * Dataset.unpersist covers CacheManager-registered plans only;
    * builds that end in `localCheckpoint(true)` (e.g. DedupShard's
    * pair table) are LogicalRDD-backed and that call is a no-op for
    * them, so their blocks would otherwise accumulate across the cold
    * pass until GC (ADVICE r10). Cold-rebuilt frames are never read
    * again, so dropping the RDD blocks directly is safe HERE — unlike
    * for stored memo entries, where it would destroy the only copy. */
  def drainColdOrphans(): Unit = {
    var ds = coldOrphans.poll()
    while (ds != null) {
      try { ds.unpersist(false); () } catch { case _: Throwable => () }
      try {
        ds.queryExecution.analyzed match {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            l.rdd.unpersist(false); ()
          case _ => ()
        }
      } catch { case _: Throwable => () }
      ds = coldOrphans.poll()
    }
  }
}
