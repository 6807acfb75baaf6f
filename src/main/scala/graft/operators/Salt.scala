package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation: groupBy (key, salt) partial
  * aggregate, then groupBy key combine — the standard treatment for a
  * hot key that would otherwise pin one reducer (SCALE.md "salting for
  * skew"). Exact for any commutative-associative aggregate.
  *
  * The salt is ROW-LOCAL (monotonically_increasing_id mod buckets:
  * partition id in the high bits, a per-partition counter in the low
  * bits Spark assigns without any shuffle), NOT derived from row
  * content — a content-derived salt (r2 hashed the value column)
  * degenerates back to one bucket exactly in the canonical skew case,
  * a hot key whose rows all carry the same value. A row-local salt
  * spreads any value distribution uniformly; the final combine makes
  * the result independent of which bucket each row landed in.
  *
  * Spark's own partial aggregation (map-side combine) already handles
  * MOST skew for algebraic aggregates; explicit salting matters when
  * the per-key state is large (collect-style aggregates) or the
  * combine runs in a single reducer per key downstream. The operator
  * exists so pipelines can opt in without restructuring. */
object Salt {

  /** Σ valueCol per keyCol via salted two-phase aggregation. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 32): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))

  /** generic form: partial and final expressions supplied by the
    * caller, e.g. partial = count, final = sum of partials. Uses the
    * same row-local salt as [[saltedSum]] — a content-derived salt
    * degenerates to one bucket exactly on the constant-value hot key
    * it exists to spread. */
  def salted(df: DataFrame, keyCol: String, buckets: Int)(
      partial: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(keyCol))
      .agg(combine.head, combine.tail: _*)
}
