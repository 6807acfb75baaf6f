package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-9 additions: the DSIR integer-overflow regime (ADVICE r8) —
  * the likelihood-ratio product Scale·(tc+1)·(rt+B) wraps int64 once a
  * hot bucket's count crosses ~9.2e12/(rt), which real Zipfian corpora
  * reach; the DECIMAL(38,0)/HUGEINT intermediates must reproduce the
  * exact BigInt arithmetic where the old int64 path wrapped silently. */
class Round9OpsSpec extends SparkTestBase {

  test("dsirWeights: one-hot-bucket corpus in the int64 wrap regime stays exact") {
    TextOps.ensureRegistered(spark)
    val M = 2000000L
    // two identical docs of M repeated tokens — every gram lands in
    // (at most) two buckets, so tc/rc concentrate far past the wrap
    // threshold while the corpus stays a 2-row DataFrame
    val toks = spark.range(2).select(col("id").as("doc_id"),
      array_repeat(lit("x"), M.toInt).as("t"))
    val target = spark.range(1).select(col("id").as("doc_id"))

    // expected values in exact BigInt arithmetic, using the engine's
    // own bucket assignment for the two distinct grams
    val B = BigInt(Pipeline.DsirBuckets)
    val S = BigInt(Pipeline.DsirScale)
    val bucketOf = spark.sql(
      s"SELECT g, pmod(${TextOps.fpSql("g")}, ${Pipeline.DsirBuckets}) AS b " +
        "FROM VALUES ('x'), ('x x') AS t(g)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perDoc = {
      val m = scala.collection.mutable.Map[Long, BigInt]().withDefaultValue(BigInt(0))
      m(bucketOf("x")) += M          // unigrams
      m(bucketOf("x x")) += (M - 1)  // bigrams
      m.toMap
    }
    val tc = perDoc                                   // target = doc 0 only
    val rc = perDoc.map { case (b, c) => b -> c * 2 } // both docs
    val tt = tc.values.sum
    val rt = rc.values.sum
    // this corpus IS in the wrap regime: the old int64 product wraps
    assert(S * (tc.values.max + 1) * (rt + B) > BigInt(Long.MaxValue),
      "corpus must exceed the int64 product envelope or the test is vacuous")
    val lr = perDoc.keys.map(b =>
      b -> (S * (tc(b) + 1) * (rt + B)) / ((rc(b) + 1) * (tt + B))).toMap
    val expTokens = perDoc.values.sum
    val expScore = perDoc.map { case (b, c) => c * lr(b) }.sum
    val expAvg = expScore / expTokens
    assert(lr.values.forall(_ > 0))

    val out = Pipeline.dsirWeightsOf(toks, target).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(1) === expTokens.toLong, "n_tokens")
      assert(r.getLong(2) === expScore.toLong, s"score_micro doc ${r.getLong(0)}")
      assert(r.getLong(3) === expAvg.toLong, s"avg_micro doc ${r.getLong(0)}")
    }
  }
}
