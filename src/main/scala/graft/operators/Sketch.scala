package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tpch

/** Approximate-distinct sketching (HyperLogLog) made engine-invariant.
  *
  * The reference keeps per-store record counts but has no sketch
  * machinery; at 100 TB a distinct count over a fact table is exactly
  * where a sketch replaces a two-shuffle exact distinct with one
  * partial-aggregable pass (registers merge by max, so the combine is
  * map-side). Spark's own `approx_count_distinct` is HLL++ with
  * implementation-defined hashing — useless against a cross-engine
  * oracle — so this is classic HLL over a 32-bit Knuth multiplicative
  * hash both engines compute bit-identically: bucket = the hash's HIGH
  * 8 bits (the well-mixed end of a multiplicative hash), rho = leading
  * zeros of the 24-bit suffix + 1. The ONE floating-point step (the
  * harmonic mean) is deferred to a single final division over an exact
  * integer: Z' = Σⱼ 2^(Scale−Mⱼ) (the same exact-integer trick as the
  * trained-IVF sum-vector centroids), so there is no FP accumulation
  * order to disagree on — est = α·m²·2^Scale / Z' is one double op.
  */
object Sketch {
  val Buckets = 256              // m = 2^8, the hash's high byte
  val SuffixBits = 24            // remaining bits feed rho
  val Scale = SuffixBits + 1     // rho ∈ [1, 25]; empty register = 0
  val MixMult = 73244475L        // 0x45d9f3b — degski 32-bit mix constant
  val HashMod = 4294967296L      // 2^32

  /** bit-length of a non-negative < 2^SuffixBits integer as a
    * when-cascade (highest test outermost); no log()/floor() FP edge
    * cases on either engine. */
  private[operators] def bitLen(x: Column): Column =
    (1 to SuffixBits).foldLeft(lit(0)) { (acc, b) =>
      when(x >= (1L << (b - 1)), lit(b)).otherwise(acc)
    }

  /** HLL distinct-count of `keyCol` over a table, reported next to the
    * exact distinct so the probe quantifies its own error (like the
    * ANN recall probe). One row: (m, z, est, exact). */
  def hllDistinct(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    // xor-shift-multiply finalizer (two degski rounds): a bare
    // multiplicative hash has no avalanche, and on dense sequential
    // keys the (bucket, suffix) pair lands on a lattice — measured
    // +62% estimate bias; with the finalizer, +0.8%. Pure 64-bit
    // integer ops (^, >>, * mod 2^32) both engines reproduce exactly.
    val hashed = df.select(pmod(col(keyCol), lit(HashMod)).as("h"))
      .select(expr("h ^ shiftright(h, 16)").as("h"))
      .select(pmod(col("h") * MixMult, lit(HashMod)).as("h"))
      .select(expr("h ^ shiftright(h, 16)").as("h"))
      .select(pmod(col("h") * MixMult, lit(HashMod)).as("h"))
      .select(expr("h ^ shiftright(h, 16)").as("h"))
      .select(expr(s"shiftright(h, $SuffixBits)").as("bucket"),
        pmod(col("h"), lit(1L << SuffixBits)).as("rest"))
    // rho = leading-zero count of the suffix + 1 (rest=0 → Scale)
    val regs = hashed
      .select(col("bucket"), (lit(Scale) - bitLen(col("rest"))).as("rho"))
      .groupBy("bucket").agg(max("rho").as("m_j"))
    // all m buckets participate: an empty bucket has register 0
    val full = spark.range(Buckets).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(coalesce(col("m_j"), lit(0)).as("m_j"))
    // Z' = Σ 2^(Scale - M_j) — exact integer, order-insensitive
    // z appears once in the final plan — no persist needed (an earlier
    // persist here leaked one orphaned cache entry per invocation)
    val z = full.agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $Scale - m_j)")).as("z"))
    val exact = df.agg(countDistinct(col(keyCol)).as("exact"))
    z.select(lit(Buckets.toLong).as("m"), col("z"),
        (lit(EstNumerator) / col("z")).as("est"))
      .crossJoin(exact)
  }

  /** α·m²·2^Scale as ONE double constant: the oracle embeds this
    * value's shortest-roundtrip decimal form, so both engines divide
    * the identical numerator by the identical integer Z'. */
  val EstNumerator: Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / Buckets)
    alpha * Buckets * Buckets * (1L << Scale).toDouble
  }

  def hllOrders(spark: SparkSession, dir: String): DataFrame =
    hllDistinct(Tpch.table(spark, dir, "lineitem").select(col("l_orderkey")),
      "l_orderkey")

  /** the two degski rounds + final xor as one Column (identical to the
    * chained-select pipeline in [[hllDistinct]]; also the register hash
    * of [[HyperBall]]) */
  /** [[mix]] for callers outside this package (streaming ops). */
  def mixPub(c: Column): Column = mix(c)

  /** [[bitLen]] over a 32-bit-bounded value for callers outside the
    * HLL (integer-log idf in [[TextOps.bm25TopDocs]]). */
  def bitLenPub(c: Column): Column =
    (1 to 32).foldLeft(lit(0)) { (acc, b) =>
      when(c >= (1L << (b - 1)), lit(b)).otherwise(acc)
    }

  private[operators] def mix(c: Column): Column = {
    val a = c.bitwiseXOR(shiftright(c, 16))
    val b = pmod(a * MixMult, lit(HashMod))
    val d = b.bitwiseXOR(shiftright(b, 16))
    val e = pmod(d * MixMult, lit(HashMod))
    e.bitwiseXOR(shiftright(e, 16))
  }

  /** Linear-counting table for the small-range correction:
    * lc(v) = m·ln(m/v) where v = empty buckets. v has only m+1
    * possible values, so BOTH engines read the correction from the
    * same 257 double CONSTANTS precomputed here — no ln() in either
    * engine's runtime, hence no libm last-bit divergence to worry
    * about. Index 0 is unused (v = 0 ⇒ raw regime). */
  private[graft] val LcTable: Array[Double] =
    (0 to Buckets).map(v =>
      if (v == 0) 0.0 else Buckets * math.log(Buckets.toDouble / v)).toArray

  /** raw-vs-linear-counting switch point, the standard 2.5·m */
  private[graft] val LcCutoff: Double = 2.5 * Buckets

  /** Grouped HLL — the shape a reporting pipeline actually runs
    * ("distinct users per segment"): registers key on (group, bucket),
    * so the whole sketch family stays ONE partial-agg groupBy with
    * |groups|·256 output rows; empty registers backfill via a tiny
    * groups×buckets frame. Same exact-integer Z' and single final
    * division per group as [[hllDistinct]] — plus the standard HLL
    * small-range correction (raw ≤ 2.5m ∧ v > 0 ⇒ linear counting),
    * because per-group cardinalities routinely sit far below m where
    * the raw estimator saturates at α·m. */
  def hllDistinctBy(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val h = mix(pmod(col(keyCol), lit(HashMod)))
    val hashed = df.select(col(groupCol).as("grp"),
      shiftright(h, SuffixBits).as("bucket"),
      pmod(h, lit(1L << SuffixBits)).as("rest"))
    val regs = hashed
      .select(col("grp"), col("bucket"), (lit(Scale) - bitLen(col("rest"))).as("rho"))
      .groupBy("grp", "bucket").agg(max("rho").as("m_j"))
    val frame = df.select(col(groupCol).as("grp")).distinct()
      .crossJoin(broadcast(spark.range(Buckets).select(col("id").as("bucket"))))
    val full = frame.join(regs, Seq("grp", "bucket"), "left")
      .select(col("grp"), coalesce(col("m_j"), lit(0)).as("m_j"))
    val z = full.groupBy("grp").agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $Scale - m_j)")).as("z"),
      sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("v"))
    val exact = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(keyCol)).as("exact"))
    val raw = lit(EstNumerator) / col("z")
    val lc = element_at(typedLit(LcTable), (col("v") + 1).cast("int"))
    z.join(exact, "grp")
      .select(col("grp"), lit(Buckets.toLong).as("m"), col("z"), col("v"),
        when(col("v") > 0 && raw <= lit(LcCutoff), lc).otherwise(raw).as("est"),
        col("exact"))
  }

  def hllOrdersByFlag(spark: SparkSession, dir: String): DataFrame =
    hllDistinctBy(Tpch.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey")), "l_returnflag", "l_orderkey")

  // ---- count-min sketch -------------------------------------------------

  /** CMS geometry: depth×width integer register matrix. Width 1024 at
    * depth 4 bounds the additive error at ~2e/1024 of the stream
    * length with probability 1 − e⁻⁴ — the heavy-hitter regime the
    * sketch exists for. */
  val CmsDepth = 4
  val CmsWidth = 1024L
  val CmsP = 1000000007L

  private def cmsCell(d: Int, k: Column): Column =
    pmod(pmod(k * (1 + 6101 * d) + 9973 * d, lit(CmsP)), lit(CmsWidth))

  /** Count-min sketch over lineitem part frequencies, probed at the
    * top-10 exact heavy hitters — est ≥ exact always (one-sided
    * error), and the report quantifies the sketch's own overcount
    * like the HLL/ANN probes do.
    *
    * Scale shape: registers are ONE partial-agg groupBy over
    * (depth, cell) — 4096 output rows at any stream length, mergeable
    * across partitions/days by addition (the reason a pipeline keeps
    * CMS instead of exact counts). The probe side joins the top keys'
    * 4 cells against the broadcast register table. */
  /** (d, cell, cnt) register table over a key column — exposed so the
    * mergeability spec can prove per-partition registers sum to the
    * whole-stream registers (the property that lets a pipeline keep
    * per-day sketches and add them). */
  private[graft] def cmsRegisters(keys: DataFrame): DataFrame =
    keys.select(explode(array(
      (0 until CmsDepth).map(d =>
        struct(lit(d).as("d"), cmsCell(d, col("k")).as("cell"))): _*)).as("p"))
      .select(col("p.d").as("d"), col("p.cell").as("cell"))
      .groupBy("d", "cell").agg(count(lit(1)).as("cnt"))

  def cmsTopParts(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tpch.table(spark, dir, "lineitem").select(col("l_partkey").as("k"))
    val cells = cmsRegisters(keys)
    val top = keys.groupBy("k").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("k")).limit(10)
    val probes = top.select(col("k"), col("exact"), explode(array(
      (0 until CmsDepth).map(d =>
        struct(lit(d).as("d"), cmsCell(d, col("k")).as("cell"))): _*)).as("p"))
      .select(col("k"), col("exact"), col("p.d").as("d"), col("p.cell").as("cell"))
    probes.join(broadcast(cells), Seq("d", "cell"))
      .groupBy("k", "exact").agg(min("cnt").as("est"))
      .select(col("k").as("partkey"), col("exact"), col("est"))
  }

  // ---- bloom runtime filter ----------------------------------------------

  /** Bloom geometry: 32K bits, 3 hashes — ~5% false positives at the
    * ~2-4K key cardinality the probe builds, enough signal for the
    * fp-rate report to be non-trivial and non-flaky. */
  val BloomBits = 32768L
  val BloomK = 3
  val BloomPriceCents = 30000000L // o_totalprice > 300k keeps a selective slice

  private def bloomBit(i: Int, k: Column): Column =
    pmod(pmod(k * (1 + 7919 * i) + 104729 * i, lit(CmsP)), lit(BloomBits))

  /** Bloom-filter runtime-filter probe — the semi-join reduction every
    * engine applies at 100 TB (build a bit set from the selective dim
    * side, drop fact rows before the shuffle): high-value order keys
    * set 3 bits each; distinct lineitem order keys probe; the report
    * compares bloom passes against the exact semi-join (true matches
    * vs false positives, fp rate over the definite-negative pool).
    * Everything integer; the two rates are single final divisions.
    *
    * Scale shape: the bit set is ≤ 3·|dim slice| distinct positions,
    * BROADCAST; probing is a map-side join + per-key counter — the
    * fact table never shuffles on the probe key. */
  def bloomProbe(spark: SparkSession, dir: String): DataFrame = {
    val hi = Tpch.table(spark, dir, "orders")
      .filter(expr("CAST(round(o_totalprice * 100) AS BIGINT)") > BloomPriceCents)
      .select(col("o_orderkey").as("k"))
    val bits = hi.select(explode(array(
      (0 until BloomK).map(i => bloomBit(i, col("k"))): _*)).as("bit"))
      .distinct()
    val probe = Tpch.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k")).distinct()
    val passed = probe.select(col("k"), explode(array(
      (0 until BloomK).map(i => bloomBit(i, col("k"))): _*)).as("bit"))
      .join(broadcast(bits.withColumn("hit", lit(1L))), Seq("bit"), "left")
      .groupBy("k").agg(sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("nbits"))
      .filter(col("nbits") === BloomK)
      .select("k")
    val truth = probe.join(hi, Seq("k"), "left_semi")
    // one tagged-union aggregation for all scalars (cf. triangleStats)
    val stats = probe.select(lit(1L).as("np"), lit(0L).as("ps"), lit(0L).as("tr"))
      .unionAll(passed.select(lit(0L).as("np"), lit(1L).as("ps"), lit(0L).as("tr")))
      .unionAll(truth.select(lit(0L).as("np"), lit(0L).as("ps"), lit(1L).as("tr")))
      .agg(sum("np").as("n_probe"), sum("ps").as("n_pass"), sum("tr").as("n_true"))
    stats.select(lit(BloomBits).as("m_bits"), col("n_probe"), col("n_pass"),
      col("n_true"), (col("n_pass") - col("n_true")).as("n_false_pos"),
      ((col("n_pass") - col("n_true")) / (col("n_probe") - col("n_true")))
        .as("fp_rate"))
  }

  /** KMV (k minimum values / bottom-k) distinct sketch size. */
  val KmvK = 256

  /** Bottom-k (KMV) distinct estimator over order keys — the OTHER
    * classic mergeable distinct sketch next to the HLL
    * ([[hllDistinct]]): keep the [[KmvK]] smallest distinct hash
    * values; est = (k−1)·2³²/h₍ₖ₎. Merging two shards' bottom-k sets
    * is bottom-k of the union, and Spark's orderBy+limit IS that merge
    * (per-partition top-k heap, then driver k-way merge — no global
    * sort). The estimate is ONE double division over exact integers;
    * selection/order is pure-integer, so the oracle matches
    * bit-for-bit. Reported next to the exact distinct (and next to
    * `q08_hll_distinct` over the same key domain, so the two sketch
    * families can be compared directly). */
  def kmvOrders(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tpch.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k")).distinct()
    val hs = keys.select(mix(pmod(col("k"), lit(HashMod))).as("h")).distinct()
    val bottom = hs.orderBy("h").limit(KmvK)
      .agg(max("h").as("h_k"), count(lit(1)).as("kk"))
    val exact = keys.agg(count(lit(1)).as("exact"))
    bottom.crossJoin(broadcast(exact))
      .select(col("kk").as("k"), col("h_k"),
        ((col("kk") - 1) * lit(HashMod) / col("h_k")).as("est"), col("exact"))
  }

  /** Keep 1-in-SampleMod rows by the mixed hash of the row key. */
  val SampleMod = 16L

  /** Quantile estimation by deterministic hash-systematic sampling —
    * the mergeable alternative to [[graft.operators.Olap.percentiles]]'
    * exact per-group window. The exact form sorts EVERY group member
    * (at one giant group that is a single-partition sort of the whole
    * table); here the full table contributes only a partial-agg count,
    * and the rank sort runs over the 1/16 hash sample. The sample
    * predicate is a pure function of the row key, so shards can be
    * sampled independently and unioned — the property that makes it a
    * sketch (two samples of two table halves ARE the sample of the
    * union; same merge story as the HLL registers). Expected rank error
    * at quantile q is √(q(1−q)·SampleMod/n) — report n_total and
    * n_sample so the consumer can bound it. All-integer output; the
    * estimates sit next to the exact p50 so the probe quantifies its
    * own error like `q08_hll_distinct` and `ann_recall` do. */
  def sampleQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tpch.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    // Rank-k selection via VALUE HISTOGRAM, not a per-group row sort:
    // a row_number window partitioned by the 4-value l_returnflag is a
    // 4-task stage sorting the whole table (the r7 bench measured the
    // stall) and only gets worse with data. groupBy(group, value) is a
    // partial-aggregable shuffle; the cumulative window then runs over
    // DISTINCT VALUES per group, and "value at rank k" ≡ "smallest
    // value whose cumulative count ≥ k" (duplicates are adjacent in
    // value order, so the rank-k row's value is identical).
    def ranked(rows: DataFrame) = rows
      .groupBy("l_returnflag", "cents").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.partitionBy("l_returnflag")
        .orderBy("cents")))
      .withColumn("cnt", sum("c").over(Window.partitionBy("l_returnflag")))
    def pick(num: Int, den: Int, name: String) =
      min(when(col("cum") >= expr(s"(cnt - 1) * $num div $den + 1"),
        col("cents"))).as(name)
    val exact = ranked(li)
      .groupBy("l_returnflag")
      .agg(max("cnt").as("n_total"), pick(1, 2, "exact_p50_cents"))
    // sample side: hash-systematic 1/16, then the same histogram pick
    // over the (16× smaller) sample
    val keyed = li.filter(pmod(
      mix(pmod(col("l_orderkey") * 41L + col("l_linenumber"), lit(HashMod))),
      lit(SampleMod)) === 0)
    val q = ranked(keyed)
      .groupBy("l_returnflag")
      .agg(max("cnt").as("n_sample"), pick(1, 4, "p25_cents"),
        pick(1, 2, "p50_cents"), pick(9, 10, "p90_cents"),
        pick(99, 100, "p99_cents"))
    exact.join(q, "l_returnflag")
  }

  /** KMV set-intersection estimate by inclusion-exclusion — the sketch
    * answer to "how many orders appear in BOTH partitions of a fact
    * table" without an exact distinct-intersect (two shuffles of the
    * full key sets). Each side keeps its bottom-[[KmvK]] hash sketch
    * (mergeable: the union's sketch is the bottom-k of the two
    * sketches' union — the property that lets 1000 executors sketch
    * shards independently), |A∪B| estimates from the merged sketch, and
    * |A∩B| = est(A) + est(B) − est(A∪B). The exact intersection rides
    * along so the probe quantifies its own error, like
    * [[hllDistinct]] and `ann_recall` do. Sets: order keys shipping
    * with returnflag R vs A. */
  def kmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    val li = Tpch.table(spark, dir, "lineitem")
    def keys(flag: String) = li.filter(col("l_returnflag") === flag)
      .select(col("l_orderkey").as("k")).distinct()
    def hashes(keys: DataFrame) =
      keys.select(mix(pmod(col("k"), lit(HashMod))).as("h")).distinct()
    def bottomK(hs: DataFrame, est: String) =
      hs.orderBy("h").limit(KmvK)
        .agg(max("h").as("h_k"), count(lit(1)).as("kk"))
        .select(((col("kk") - 1) * lit(HashMod) / col("h_k")).as(est))
    val a = keys("R"); val b = keys("A")
    val ha = hashes(a); val hb = hashes(b)
    val estA = bottomK(ha, "est_a")
    val estB = bottomK(hb, "est_b")
    // union sketch = bottom-k of the two sketches' member union
    val estU = bottomK(ha.unionByName(hb).distinct(), "est_union")
    val exact = a.join(b, "k").agg(count(lit(1)).as("exact_intersect"))
    estA.crossJoin(broadcast(estB)).crossJoin(broadcast(estU))
      .crossJoin(broadcast(exact))
      .select(col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"),
        col("exact_intersect"))
  }
}
