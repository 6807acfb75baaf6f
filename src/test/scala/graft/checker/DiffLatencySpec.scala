package graft.checker

import graft.SparkTestBase

/** Keeps the T3 latency pipeline green: the synthesized per-batch
  * DiffStore must produce its closed-form violation count through the
  * real MemoryStream → foreachBatch → violationsFromDiffs path. */
class DiffLatencySpec extends SparkTestBase {

  test("steady stream of tx batches yields the exact expected violations") {
    val (ts, violations) = DiffLatency.run(spark,
      nBatches = 4, txPerBatch = 10, recordsPerTx = 6)
    assert(ts.size === 4, "one timing per micro-batch")
    // per batch: 10 tx × 6 records, odd k's o_next_rel dangles → 3/tx
    assert(violations === 4L * 10 * 6 / 2)
    assert(ts.forall(_ > 0.0))
  }

  test("batch diff synthesis: clean pointers target in-tx rels") {
    val d = DiffLatency.batchDiffs(spark, Seq(7L), recordsPerTx = 4)
    // k ∈ {0,2} point at rels 7e6+500000+k which ARE in d.rels → clean;
    // k ∈ {1,3} dangle
    assert(DiffCheck.violationsFromDiffs(d).count() === 2L)
  }
}
