package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic graph/property generation (SURVEY.md §2.8 D1-D3) — the
  * Spark re-expression of the reference's generator
  * (enterprise-performance-tests/.../generator/DataGenerator.java:60-117,
  * PropertyGenerator.java:23-67, RelationshipSpec.java:25-60).
  *
  * Value shapes mirror the reference: INTEGER ∈ [0,16), STRING length
  * 50-120, BYTE_ARRAY of 50 ints ∈ [0,256), SINGLE_STRING constant;
  * relationship specs "FOO:2,BAR:1" emit count edges per node to
  * uniform pseudo-random targets (DataGenerator.java:173-188), so
  * relCount = nodeCount × Σspec (DataGenerator.java:96-102).
  *
  * Randomness is a Park-Miller LCG evaluated as a pure function of
  * (seed, id, stream) — NOT Spark's rand(seed), whose draw depends on
  * partition layout. A pure column expression is partitioning-invariant
  * (generate 10⁹ rows on 1000 executors, same values), survives
  * Spark 4's ANSI overflow checking (all arithmetic stays < 2⁶³), and
  * is reproducible in the DuckDB oracle.
  */
object DataGen {
  val Seed = 42L
  val M = 2147483647L // 2^31 - 1

  /** Park-Miller step over a (id, stream)-derived state: two
    * multiplicative rounds to decorrelate consecutive ids. The id is
    * reduced mod M first so no intermediate exceeds ~2.4e18 — safe
    * under ANSI overflow checking for any id < 2⁶³/131. The emitted
    * text is plain integer SQL, valid verbatim in Spark AND DuckDB
    * (the oracle reuses it). */
  def prngSql(idExpr: String, stream: Long): String = {
    val st = s"((($idExpr) % $M) * 1103515245 + ${Seed + stream * 7919}) % $M"
    val r2 = s"(((($st) * 16807) % $M) * 16807) % $M"
    // nonlinear third round (squaring) — two purely multiplicative
    // rounds leave visible correlation on structured ids (~60% of the
    // expected distinct draws). Only *, +, % so the text stays valid in
    // both Spark and DuckDB verbatim; r2² < 2⁶² keeps ANSI happy.
    s"(((($r2) * ($r2)) % $M) * 48271 + ($r2)) % $M"
  }
  def prng(idExpr: String, stream: Long): Column = expr(prngSql(idExpr, stream))

  final case class Spec(name: String, count: Int)
  /** parse "FOO:2,BAR:1" (RelationshipSpec/PropertySpec format) */
  def parseSpec(s: String): Seq[Spec] =
    s.split(",").toSeq.filter(_.nonEmpty).map { part =>
      val Array(n, c) = part.split(":")
      Spec(n.trim, c.trim.toInt)
    }

  /** D1+D3: nodeCount nodes, each with the given property spec.
    * Property columns are named <TYPE>_<i>. */
  def nodes(spark: SparkSession, nodeCount: Long, propSpec: String): DataFrame = {
    val specs = parseSpec(propSpec)
    val cols = specs.zipWithIndex.flatMap { case (Spec(t, n), si) =>
      (0 until n).map { j =>
        val stream = si * 100L + j
        val name = s"${t.toLowerCase}_${si}_$j"
        t match {
          case "INTEGER" => (prng("id", stream) % 16).as(name)
          case "SINGLE_STRING" => lit("SINGLE").as(name)
          case "STRING" =>
            // length 50-120; content = repeated lowercase chars from the
            // per-position hash (PropertyGenerator: random 50-120 chars)
            expr(s"array_join(transform(sequence(1, CAST(50 + ${prngSql("id", stream)} % 71 AS INT)), k -> chr(97 + ${prngSql("id * 131 + k", stream)} % 26)), '')")
              .as(name)
          case "BYTE_ARRAY" =>
            expr(s"transform(sequence(1, 50), k -> CAST(${prngSql("id * 53 + k", stream)} % 256 AS INT))")
              .as(name)
          case other => throw new IllegalArgumentException(other)
        }
      }
    }
    spark.range(nodeCount).select(col("id") +: cols: _*)
  }

  /** D2: per node, per spec entry, `count` typed edges to uniform
    * pseudo-random targets. `id` is a collision-free arithmetic edge id
    * (src × Σspec + per-spec offset + j): dense 0..relCount-1, assigned
    * without any shuffle or driver allocation, so downstream record-store
    * derivations ([[graft.checker.ScaleCheck]]) get stable rel ids at
    * any scale. */
  def rels(spark: SparkSession, nodeCount: Long, relSpec: String): DataFrame = {
    val specs = parseSpec(relSpec)
    val total = specs.map(_.count).sum
    val offsets = specs.map(_.count).scanLeft(0)(_ + _)
    val perType = specs.zipWithIndex.map { case (Spec(t, n), si) =>
      spark.range(nodeCount)
        .select(col("id").as("src"),
          explode(sequence(lit(0), lit(n - 1))).as("j"))
        .select(
          (col("src") * total + offsets(si) + col("j")).as("id"),
          col("src"),
          expr(s"${prngSql(s"src * 17 + j", 1000L + si)} % $nodeCount").as("dst"),
          lit(t).as("type"))
    }
    perType.reduce(_ unionAll _)
  }

  /** Summary over a generated workload — the oracle-checkable surface
    * (DuckDB regenerates the same graph from range()): per-metric rows
    * mirror the reference's post-generation store counts
    * (DataGenerator.java:118-131). */
  def summary(spark: SparkSession, nodeCount: Long): DataFrame =
    summaryMemo.getOrElseUpdate(spark, s"gen:$nodeCount")(
      summaryCompute(spark, nodeCount).persist())

  /** Pure function of (session, nodeCount) — the generators are
    * deterministic — re-run per touch in r12's warm tier. Output-memo
    * lifecycle, keyed by the generated size rather than an sf dir:
    * fill on first timed touch, cold pass prices the regeneration
    * (VERDICT r12 Next #1). */
  private val summaryMemo = new graft.SessionMemo[DataFrame](outputMemo = true)

  private def summaryCompute(spark: SparkSession, nodeCount: Long): DataFrame = {
    val n = nodes(spark, nodeCount, "INTEGER:2,STRING:1")
    val r = rels(spark, nodeCount, "FOO:2,BAR:1")
    val nodeMetrics = n.agg(
      count(lit(1)).as("v1"),
      sum("integer_0_0").as("v2"),
      sum(length(col("string_1_0")).cast("long")).as("v3"))
      .select(lit("nodes").as("metric"), col("v1"), col("v2"), col("v3"))
    val relMetrics = r.groupBy("type").agg(
      count(lit(1)).as("v1"),
      countDistinct("dst").as("v2"),
      sum("dst").as("v3"))
      .select(concat(lit("rels_"), col("type")).as("metric"),
        col("v1"), col("v2"), col("v3"))
    nodeMetrics.unionAll(relMetrics)
  }
}
