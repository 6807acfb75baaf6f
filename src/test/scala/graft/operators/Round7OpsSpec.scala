package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-7 additions: domain cap, shard packing, Zipf fit, BPE
  * training, KMV intersection, grouped MAD, mutual-kNN graph. */
class Round7OpsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("domainCap: kept ≤ cap per source, totals add up") {
    val rows = Pipeline.domainCap(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, kept) = (r.getLong(1), r.getLong(2))
      assert(kept <= Pipeline.DomainCap)
      assert(kept <= total)
      // chars_dropped is 0 iff nothing exceeded the cap
      if (total <= Pipeline.DomainCap) assert(r.getLong(3) === 0L)
    }
  }

  test("shardPack: shard payloads cover all bytes; only the last shard per source underfills") {
    val packed = Media.shardPack(spark, dir).persist()
    val docs = graft.sources.Tpch.table(spark, dir, "documents")
    val totalBytes = docs.agg(sum(length(col("text")).cast("long"))).head.getLong(0)
    assert(packed.agg(sum("shard_bytes")).head.getLong(0) === totalBytes)
    assert(packed.agg(sum("n_blobs")).head.getLong(0) === docs.count())
    // start-offset rule: a non-final shard closes only once the
    // source's RUNNING payload crosses its upper boundary — the shard's
    // own bytes may underfill when its first blob starts mid-window
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("shard")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val nonFinal = packed
      .withColumn("mx", max("shard").over(w))
      .withColumn("cum", sum("shard_bytes").over(wCum))
      .filter(col("shard") < col("mx"))
    assert(nonFinal
      .filter(col("cum") < (col("shard") + 1) * Media.ShardBytes)
      .count() === 0L)
    packed.unpersist()
    ()
  }

  test("zipfFit: one row, k bounded, negative slope on a frequency-ranked head") {
    val r = TextOps.zipfFit(spark, dir).head
    assert(r.getLong(0) <= TextOps.ZipfK)
    // ranks are ordered by descending frequency, so the OLS slope of
    // ln(freq) on ln(rank) cannot be positive
    assert(r.getDouble(1) <= 0.0)
    assert(r.getLong(3) > 0 && r.getLong(4) > 0)
  }

  test("bpeTrain: one merge per round, counts non-increasing, merged=a||b") {
    val m = TextOps.bpeTrain(spark, dir).orderBy("step").collect()
    assert(m.length === TextOps.BpeMerges)
    assert(m.map(_.getLong(0)).toSeq === (1L to TextOps.BpeMerges.toLong))
    m.foreach { r =>
      assert(r.getString(3) === r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0)
    }
    // a later round can never beat an earlier round's argmax count:
    // merging only removes pair occurrences, and the earlier argmax
    // was global
    val counts = m.map(_.getLong(4))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("bpeTrain merge rewrite matches a reference re-tokenization") {
    // re-derive: applying the learned merges to the word list must
    // reproduce each round's pair count on a driver-side reference
    // implementation (sequential leftmost-greedy — the semantics the
    // gaps-and-islands parity rule must reproduce, incl. a = b runs)
    val docs = graft.sources.Tpch.table(spark, dir, "documents")
    val words = docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var state = words.map { case (w, c) => (w.split("").toVector, c) }
    val learned = TextOps.bpeTrain(spark, dir).orderBy("step").collect()
    learned.foreach { r =>
      val (a, b, cnt) = (r.getString(1), r.getString(2), r.getLong(4))
      // reference pair count before applying this merge: merges the
      // leftmost-greedy scan would perform (non-overlapping — for
      // a = b an 'aaa' run yields floor(3/2) = 1, not 2)
      val ref = state.map { case (syms, c) =>
        c * (syms.length - mergeOnce(syms, a, b).length)
      }.sum
      assert(ref === cnt, s"round ${r.getLong(0)} count mismatch")
      state = state.map { case (syms, c) => (mergeOnce(syms, a, b), c) }
    }
  }

  test("kmvIntersect: estimates positive, exact ≤ min side, inclusion-exclusion holds") {
    val r = Sketch.kmvIntersect(spark, dir).head
    val (ea, eb, eu, ei, ex) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
    assert(ea > 0 && eb > 0 && eu > 0)
    assert(math.abs(ea + eb - eu - ei) < 1e-9)
    assert(ex >= 0 && ex <= math.min(ea, eb) * 2) // sanity, not tightness
    // union estimate can never fall below either side's estimate by
    // more than sketch noise at this k; exact containment bound:
    assert(eu >= math.max(ea, eb) * 0.5)
  }

  test("madByGroup matches a driver-side exact computation") {
    val got = Olap.madByGroup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rows = graft.sources.Tpch.table(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size - 1) / 2)
    rows.groupBy(_._1).foreach { case (flag, grp) =>
      val cents = grp.map(_._2).toSeq
      val med = lowerMedian(cents)
      val mad = lowerMedian(cents.map(c => math.abs(c - med)))
      val (n, madGot, medGot) = got(flag)
      assert(n === cents.size.toLong)
      assert(medGot === med)
      assert(madGot === mad)
    }
  }

  test("knnGraph: canonical label pairs, edge total bounded by k·n/2") {
    val g = Similarity.knnGraph(spark, dir).persist()
    val rows = g.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) <= r.getLong(1)))
    val nVec = graft.sources.Tpch.table(spark, dir, "embeddings").count()
    val totalEdges = rows.map(_.getLong(2)).sum
    // each vector keeps ≤ k neighbors; mutual edges are a subset
    assert(totalEdges <= Similarity.KnnGraphK * nVec / 2 + 1)
    g.unpersist()
    ()
  }
}
