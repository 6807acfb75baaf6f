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
  */
final class SessionMemo[V] {
  private val entries = TrieMap[(SparkSession, String), V]()
  private val hooked = TrieMap[SparkSession, Unit]()

  def getOrElseUpdate(spark: SparkSession, tag: String)(build: => V): V = {
    hooked.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          entries.filterInPlace { case ((s, _), _) => s ne spark }
          hooked.remove(spark)
          ()
        }
      })
    })
    entries.getOrElseUpdate((spark, tag), build)
  }
}
