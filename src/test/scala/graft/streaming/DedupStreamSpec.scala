package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{Dedup, DedupScale, DedupShard, DedupStream, TextOps}

/** The streaming wiring must be a pure re-packaging of the incremental
  * probe: the pairs the micro-batch loop admits are exactly the pairs
  * the same probe computes called directly, and every planted
  * near-dup surfaces. */
class DedupStreamSpec extends SparkTestBase {

  test("micro-batch pairs equal the direct probe; planted recall 1.0") {
    TextOps.ensureRegistered(spark)
    val nBase = 2000L
    val docsPerBatch = 20
    val (timings, execs, pairs, hits, expected) =
      DedupStream.run(spark, nBatches = 2, docsPerBatch = docsPerBatch, nBase = nBase)
    assert(timings.size === 2)
    assert(execs.size === 2)
    assert(hits === expected, s"planted recall: $hits of $expected")

    // direct (non-streaming) probe over the same two delta slices
    val base = DedupScale.corpus(spark, nBase)
    val basePost = Dedup.rawPostings(base).persist()
    val baseDf = basePost.groupBy("sfp").agg(count(lit(1)).as("df"))
    val baseCapped = basePost
      .join(baseDf.filter(col("df") <= Dedup.MaxDf).select("sfp"), "sfp")
    val direct = (0L until 2L).map { b =>
      DedupStream.batchPairs(baseCapped, baseDf,
        DedupStream.deltaDocs(spark, b, docsPerBatch, nBase)).count()
    }.sum
    basePost.unpersist()
    assert(pairs === direct, s"stream admitted $pairs pairs, direct probe $direct")
  }

  test("maintained-index probe equals the union recompute (dd_stream_batch == dd_incremental)") {
    TextOps.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.001"
    val a = Dedup.streamBatchPairs(spark, dir)
    val b = Dedup.incrementalPairs(spark, dir)
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  test("SHARDED probe (partition-pruned scans + size sidecar) equals the full-scan batch probe") {
    TextOps.ensureRegistered(spark)
    val nBase = 2000L
    val docsPerBatch = 30
    val base = DedupScale.corpus(spark, nBase)
    val idx = java.nio.file.Files
      .createTempDirectory("shard_idx").toString
    DedupShard.buildIndex(spark, base, idx, nShards = 16)
    val basePost = Dedup.rawPostings(base).persist()
    val baseDf = basePost.groupBy("sfp").agg(count(lit(1)).as("df"))
    val baseCapped = basePost
      .join(baseDf.filter(col("df") <= Dedup.MaxDf).select("sfp"), "sfp")
    (0L until 2L).foreach { b =>
      val delta = DedupStream.deltaDocs(spark, b, docsPerBatch, nBase)
      val full = DedupStream.batchPairs(baseCapped, baseDf, delta)
      val (sharded, stats) = DedupShard.probe(spark, idx, 16, delta)
      assert(sharded.exceptAll(full).count() === 0L, s"batch $b: extra pairs")
      assert(full.exceptAll(sharded).count() === 0L, s"batch $b: missing pairs")
      assert(stats.shardsTouched <= stats.nShards)
      assert(stats.postingsScanned > 0L)
    }
    basePost.unpersist()
  }

  test("sharded query path equals the incremental recompute (dd_shard_probe == dd_incremental)") {
    TextOps.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.001"
    val a = DedupShard.shardProbe(spark, dir)
    val b = Dedup.incrementalPairs(spark, dir)
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }
}
