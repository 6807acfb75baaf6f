package graft

/** Gates for the bloom-prefiltered n-gram contamination audit
  * (VERDICT r12 Next #5): the bloom path must be output-identical to
  * the exact path (no false negatives by construction, false positives
  * removed by the exact join), the prefilter must survive into the
  * EXECUTED plan ahead of the gram-key exchange (a filter optimized
  * away or hoisted above the join is the regression this pins), and
  * the measured row reduction must be real.
  */
class OverlapBloomSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("bloom path is output-identical to the exact contamination audit") {
    val exact = graft.operators.Pipeline.ngramOverlap(spark, dir)
      .collect().map(_.toSeq).toSet
    val bloom = graft.operators.Pipeline.ngramOverlapBloom(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(bloom == exact)
    assert(bloom.nonEmpty)
  }

  test("prefilter sits ahead of the gram-join shuffle in the executed plan") {
    val p = graft.operators.Pipeline.ngramOverlapBloom(spark, dir)
      .queryExecution.executedPlan.toString
    val lines = p.linesIterator.toIndexedSeq
    // the bitset membership test must survive optimization — either as
    // a Filter or fused into the broadcast join's condition (Catalyst
    // merges a filter over a cross join into the join itself)
    val idxProbe = lines.indexWhere(_.contains("graft_bloom_probe"))
    assert(idxProbe >= 0, p)
    assert(lines(idxProbe).contains("Filter") ||
      lines(idxProbe).contains("BroadcastNestedLoop"), lines(idxProbe))
    // single-hash pin (VERDICT r13 Next #6): the probe is ONE native
    // expression (k hashes computed once each inside it), not the
    // composed SQL form whose 2k xxhash64 copies no codegen CSE can
    // collapse out of a BroadcastNestedLoopJoin condition
    assert("graft_bloom_probe".r.findAllIn(lines(idxProbe)).length == 1,
      lines(idxProbe))
    assert(!lines(idxProbe).contains("xxhash64"), lines(idxProbe))
    // and the bitset row must attach by broadcast (map-side prefilter)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoop"), p)
    // tree print order: a parent prints above its subtree. The probe
    // must be INSIDE the hit join's input (prints below the join-on-
    // gram line) — applied before any data movement the exact join
    // needs (at test scale AQE broadcasts the train side, so the probe
    // feeds the join directly; at scale it feeds the gram exchange).
    // The anti-shape — probing AFTER the join — would print the probe
    // above the join line.
    val idxHitJoin = lines.indexWhere(l =>
      l.contains("Join [gram") || l.contains("Join gram"))
    assert(idxHitJoin >= 0, p)
    assert(idxProbe > idxHitJoin,
      s"probe at line $idxProbe above the gram join at $idxHitJoin:\n$p")
  }

  test("prefilter measurably reduces the eval rows reaching the exact join") {
    val (before, after) = graft.operators.Pipeline
      .overlapBloomReduction(spark, dir)
    assert(before > 0)
    // no false negatives: every true hit must still pass, so `after`
    // can never undershoot the true hit count
    val trueHits = {
      import org.apache.spark.sql.functions.sum
      graft.operators.Pipeline.ngramOverlap(spark, dir)
        .agg(sum("n_hits")).collect()(0).getLong(0)
    }
    assert(after >= trueHits, s"prefilter dropped true hits: $after < $trueHits")
    assert(after < before,
      s"prefilter removed nothing: $after of $before eval gram rows passed")
    info(s"eval gram rows: $before -> $after " +
      f"(${100.0 * (before - after) / before}%.1f%% removed; true hits $trueHits)")
  }
}
