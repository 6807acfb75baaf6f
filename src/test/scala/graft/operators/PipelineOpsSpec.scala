package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic assertions for the LLM-pipeline operators (beyond the
  * DuckDB-oracle hash parity the driver checks): the constructed dup
  * pairs are actually found, LSH candidates are a subset of the exact
  * method's pairs, ANN ranking is ordered. */
class PipelineOpsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("decontamination flags every benchmark source doc; all flags share real windows") {
    val out = Dedup.decontaminate(spark, dir).persist()
    val t = TextOps.docs(spark, dir)
      .select(col("doc_id"), TextOps.toks(col("text")).as("t"))
    // every doc the benchmark excerpted from contains its own excerpt,
    // so it MUST be flagged (the leak the operator exists to catch)
    val sources = t
      .filter(pmod(col("doc_id"), lit(Dedup.BenchMod)) === 0)
      .filter(size(col("t")) >= Dedup.BenchSkip + Dedup.SubstrK)
      .select("doc_id")
    assert(sources.exceptAll(out.select("doc_id")).count() === 0L)
    assert(sources.count() > 0L)
    // no vacuous flags
    assert(out.filter(col("hit_grams") < 1 || col("n_bench") < 1).count() === 0L)
    out.unpersist()
    ()
  }

  test("sequence packing conserves tokens and respects the start-bin rule") {
    val packed = Pipeline.packSequences(spark, dir).persist()
    val d = TextOps.docs(spark, dir)
      .select(size(TextOps.toks(col("text"))).cast("long").as("n"))
    // conservation: every token lands in exactly one sequence
    val total = d.agg(sum("n")).head().getLong(0)
    assert(packed.agg(sum("seq_tokens")).head().getLong(0) === total)
    // bins are non-negative and no sequence is empty
    assert(packed.filter(col("seq_id") < 0 || col("n_docs") < 1).count() === 0L)
    // a doc's bin is its START offset div budget, and starts are
    // strictly below the source's token total — so every source's max
    // bin id is bounded by (total_tokens - 1) div budget
    val bySource = packed.groupBy("source")
      .agg(max("seq_id").as("mx"), sum("seq_tokens").as("tot"))
    assert(bySource.filter(
      col("mx") > (col("tot") - 1) / Pipeline.SeqTokens).count() === 0L)
    packed.unpersist()
    ()
  }

  test("deterministic split partitions every doc exactly once, ~80/10/10") {
    val s = Pipeline.splitStats(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = TextOps.docs(spark, dir).count()
    assert(s.values.sum === total)
    assert(s.keySet === Set("train", "val", "test"))
    // hash balance: train within 10 percentage points of design
    assert(math.abs(s("train").toDouble / total - 0.8) < 0.1)
  }

  test("mixture sampling keeps exactly the integer target per source") {
    val m = Pipeline.mixtureSample(spark, dir).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (frac, nTotal, nKept) =
        (r.getAs[Long]("frac_num"), r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      // kept count is FLOOR(n_total * frac / 10) — the integer contract
      assert(nKept === nTotal * frac / Pipeline.MixDen,
        s"source=${r.getString(0)}")
    }
  }

  test("pii scan flags exactly the probe docs with one hit per pattern") {
    val p = TextOps.piiStats(spark, dir).persist()
    val probes = TextOps.docs(spark, dir)
      .filter(pmod(col("doc_id"), lit(TextOps.PiiMod)) === 0).count()
    assert(p.count() === probes) // natural corpus has no PII
    assert(p.filter(col("n_email") =!= 1L || col("n_phone") =!= 1L ||
      col("n_ip") =!= 1L).count() === 0L)
    p.unpersist()
    ()
  }

  test("cross-source pair counts conserve the verified pair total") {
    val cross = Dedup.crossSourcePairs(spark, dir)
    val total = Dedup.ngramJaccard(spark, dir).count()
    assert(cross.agg(sum("n_pairs")).head().getLong(0) === total)
    // unordered pairs: x <= y always
    assert(cross.filter(col("source_x") > col("source_y")).count() === 0L)
  }

  test("oov rate conserves tokens and bounds the rate") {
    val o = TextOps.oovRate(spark, dir).persist()
    val total = TextOps.docs(spark, dir)
      .select(size(TextOps.toks(lower(col("text")))).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(o.agg(sum("n_tokens")).head().getLong(0) === total)
    assert(o.filter(col("n_oov") < 0 || col("n_oov") > col("n_tokens")).count() === 0L)
    // the top-K vocab covers the head of a zipfian corpus: some doc
    // must contain vocab tokens (non-vacuous join)
    assert(o.filter(col("n_oov") < col("n_tokens")).count() > 0L)
    o.unpersist()
    ()
  }

  test("full release pipeline equals the same gates composed in a different order") {
    val full = Pipeline.curateFull(spark, dir)
    val total = full.agg(sum("n_docs")).head().getLong(0)
    // recompute survivors with set ops instead of join order: quality
    // pass, minus dedup drops, minus contaminated
    val qual = TextOps.quality(spark, dir)
      .filter(col("quality") >= Pipeline.QualityTau).select("doc_id")
    val drops = Dedup.dedupClusters(spark, dir)
      .filter(col("doc_id") < Dedup.IdOffset).select("doc_id")
    val cont = Dedup.decontaminate(spark, dir).select("doc_id")
    val expected = qual.exceptAll(drops).exceptAll(cont).count()
    assert(total === expected)
    // split/lang domains are closed
    val rows = full.collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("exact dedup finds every constructed duplicate with original id as keeper") {
    val d = Dedup.exact(spark, dir).collect()
    assert(d.length === 500)
    assert(d.forall(_.getLong(2) == 2))
    assert(d.forall(_.getLong(1) < Dedup.IdOffset)) // keeper = original
  }

  test("ngram jaccard finds the constructed near-dup pairs") {
    val pairs = Dedup.ngramJaccard(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val constructed = pairs.count { case (a, b) => b == a + Dedup.IdOffset }
    // docs with ≥ ~10 tokens keep jaccard ≥ 0.5 after dropping 3 tokens
    assert(constructed > 400, s"only $constructed constructed pairs found")
  }

  test("minhash LSH pairs are a subset of exact ngram-jaccard pairs") {
    val ng = Dedup.ngramJaccard(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashLsh(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(ng))
    assert(mh.size > 300) // banding recall on near-identical docs is high
  }

  test("ann brute force returns k ordered neighbors per query") {
    val rows = Similarity.annBruteForce(spark, dir)
      .orderBy("qid", "rank").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.length === Similarity.K)
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }

  test("lsh ann cosines are a subset of brute-force candidates' scores") {
    // every LSH result is a real neighbor with the exact same cosine the
    // brute-force path computes (same integer arithmetic)
    val bf = Similarity.annBruteForce(spark, dir)
      .select("qid", "nid", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.annLsh(spark, dir)
      .select("qid", "nid", "cos").collect()
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      bf.get(k).foreach(c => assert(c === r.getDouble(2)))
    }
  }

  test("ivf ann cosines agree with brute force; recall is substantial") {
    val bf = Similarity.annBruteForce(spark, dir)
      .select("qid", "nid", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.annIvf(spark, dir)
      .select("qid", "nid", "cos").collect()
    ivf.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      // same integer arithmetic ⇒ exact same cosine where both scored
      bf.get(k).foreach(c => assert(c === r.getDouble(2)))
    }
    // nprobe=2 over 20 lists: expect a reasonable share of true top-5
    val hits = ivf.count(r => bf.contains((r.getLong(0), r.getLong(1))))
    assert(hits > ivf.length / 4, s"recall too low: $hits/${ivf.length}")
  }

  test("embedding near-dup finds the perturbed twins") {
    val pairs = Similarity.embeddingDup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twins = pairs.count { case (a, b) => b == a + Similarity.IdOffset }
    // twins share a bucket unless a hyperplane dot sits within 1-ulp of 0
    assert(twins > 450, s"only $twins twins found")
    pairs.foreach { case (a, b) => assert(a < b) }
  }

  test("media features checksum matches a driver-side recomputation") {
    val row = Media.mediaFeatures(spark, dir)
      .filter(col("doc_id") === 0).head()
    val text = TextOps.docs(spark, dir)
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    assert(row.getLong(1) === bytes.length.toLong)
    assert(row.getLong(3) === bytes.map(_ & 0xff).map(_.toLong).sum % Media.ChecksumMod)
  }

  test("frame sampling expands each blob to its strided frame rows") {
    val rows = Media.frameSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val texts = TextOps.docs(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.map(_._1).toSet === texts.keySet)
    rows.foreach { case (id, f, b) =>
      val bytes = texts(id).getBytes("UTF-8")
      assert(f % Media.FrameStride === 0)
      assert(b === (bytes((f * Media.FrameBytes).toInt) & 0xff).toLong)
    }
  }

  test("frame sampling of an empty blob emits no rows (no crash)") {
    assert(Media.frameRows(7L, Array.empty[Byte]).isEmpty)
    // one-byte blob: exactly frame 0
    assert(Media.frameRows(7L, Array[Byte](65)).toList === List((7L, 0L, 65L)))
  }

  test("simhash of identical token sets is identical, fingerprint differs") {
    val sh = TextOps.simhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sh.size === 500)
    // spread: not all docs collapse to one signature
    assert(sh.values.toSet.size > 100)
  }

  test("simhash-banded near-dup finds constructed twins without pair blowup") {
    val rows = Dedup.simhashDup(spark, dir).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val twins = pairs.count { case (a, b) => b == a + Dedup.IdOffset }
    // shingle-feature simhash: a 3-token edit flips few of 30 bits, but
    // the flips can straddle all 3 bands (no clean band ⇒ no candidate)
    // — ~77% recall is this LSH's real trade, like any banding scheme
    assert(twins > 350, s"only $twins twins found")
    // and unrelated docs do NOT flood the band buckets (the token-level
    // variant degenerates to ~quadratic pairs on this shared-vocab corpus)
    assert(pairs.size < 2000, s"${pairs.size} pairs — band join blew up")
    rows.foreach(r => assert(r.getInt(2) <= Dedup.MaxHam))
  }

  test("dedup clusters canonicalize every pair member to the cluster min") {
    val drops = Dedup.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.ngramJaccard(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // every doc appearing in a pair resolves to one canonical ≤ both ends
    def canon(d: Long): Long = drops.getOrElse(d, d)
    pairs.foreach { case (a, b) =>
      assert(canon(a) === canon(b), s"pair ($a,$b) split across clusters")
      assert(canon(a) <= a && canon(a) <= b)
    }
    // canonicals are never themselves dropped
    drops.values.foreach(c => assert(!drops.contains(c)))
    assert(drops.nonEmpty)
  }

  test("vocab top-k is the token frequency head, deterministically ordered") {
    val rows = TextOps.vocabTopK(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === TextOps.VocabK)
    // non-increasing counts with (n desc, tok) tie-break
    rows.sliding(2).foreach { case Array((t1, n1), (t2, n2)) =>
      assert(n1 > n2 || (n1 == n2 && t1 < t2))
    }
  }

  test("curation composes quality, language and dedup gates consistently") {
    val out = Pipeline.curate(spark, dir).collect()
    assert(out.nonEmpty)
    val totalDocs = out.map(_.getLong(1)).sum
    // survivors are a strict, non-empty subset of the 500 originals
    assert(totalDocs > 0 && totalDocs < 500)
    // cross-check against applying the gates independently
    val q = TextOps.quality(spark, dir)
      .filter(col("quality") >= Pipeline.QualityTau).select("doc_id")
    val drops = Dedup.dedupClusters(spark, dir)
      .filter(col("doc_id") < Dedup.IdOffset).select("doc_id")
    val expected = q.join(drops, Seq("doc_id"), "left_anti").count()
    assert(totalDocs === expected)
  }

  test("epoch shuffle: complete partition per epoch, distinct permutations, reproducible") {
    val rows = Pipeline.epochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    // every doc lands in exactly one shard, both epochs
    Seq(1L, 2L).foreach { e =>
      assert(rows.collect { case ((`e`, _), (n, _)) => n }.sum === nDocs)
    }
    // the two epochs are different permutations: shard contents (hence
    // position checksums) must not all coincide
    val e1 = rows.collect { case ((1L, s), (_, c)) => s -> c }.toMap
    val e2 = rows.collect { case ((2L, s), (_, c)) => s -> c }.toMap
    assert(e1.exists { case (s, c) => e2.get(s).exists(_ != c) })
    // reproducible: a second run yields the identical checksums
    val again = Pipeline.epochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(again === rows)
  }

  test("variable-length path expansion matches hand-joined counts") {
    val out = GraphOps.pathExpand(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.size === 15) // 5 regions × depths 1..3
    // depth-1 paths from all regions = 25 nations
    assert(out.collect { case ((_, 1), n) => n }.sum === 25L)
    // depth-2 = customers + suppliers (every one reaches via its nation)
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    val nSupp = spark.read.parquet(s"$dir/supplier.parquet").count()
    assert(out.collect { case ((_, 2), n) => n }.sum === nCust + nSupp)
    // depth-3 = orders (PLACED_BY) + lineitem-side paths (SUPPLIED_BY)
    val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
    val nLine = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(out.collect { case ((_, 3), n) => n }.sum === nOrders + nLine)
  }
}
