package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** aucFromScored vs the all-pairs definition of AUC:
  * mean over (pos, neg) pairs of [1 if s_p > s_n, ½ if tied, 0 else]. */
class EvalAucSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  private def run(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Double) = {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (s, p) => Row(s, p) }: _*), schema)
    val r = TextOps.aucFromScored(df).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  /** 2× the all-pairs score sum, so ties stay integral */
  private def bruteU2(rows: Seq[(Long, Long)]): Long = {
    val ps = rows.filter(_._2 == 1L).map(_._1)
    val ns = rows.filter(_._2 == 0L).map(_._1)
    ps.map(p => ns.map(n => if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
  }

  test("tie-heavy hand table matches the all-pairs definition") {
    val rows = Seq[(Long, Long)](
      (5L, 1L), (5L, 0L), (5L, 1L), // three-way tie across classes
      (3L, 0L), (3L, 0L),           // tied negatives below
      (9L, 1L), (1L, 0L), (9L, 0L))
    val (np, nn, num, den, auc) = run(rows)
    assert(np === 3L && nn === 5L)
    assert(num === bruteU2(rows))
    assert(den === 2L * np * nn)
    assert(auc === BigDecimal(num.toDouble / den)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("perfect separation gives AUC 1, reversed gives 0") {
    val good = Seq[(Long, Long)]((10L, 1L), (11L, 1L), (1L, 0L), (2L, 0L))
    assert(run(good)._5 === 1.0)
    val bad = good.map { case (s, p) => (s, 1L - p) }
    assert(run(bad)._5 === 0.0)
  }

  test("all-tied scores give AUC exactly 0.5") {
    val rows = Seq[(Long, Long)]((7L, 1L), (7L, 0L), (7L, 1L), (7L, 0L))
    val (_, _, num, den, auc) = run(rows)
    assert(num * 2 === den)
    assert(auc === 0.5)
  }

  test("PR curve: recall is monotone in threshold and ends at 1") {
    import org.apache.spark.sql.functions._
    val pr = TextOps.prCurve(spark, "/root/testdata/sf0.001")
      .orderBy(col("thr").desc).collect()
    assert(pr.nonEmpty)
    val recalls = pr.map(_.getDouble(5))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a })
    assert(recalls.last === 1.0) // lowest threshold classifies all positive
    // counts are consistent at every threshold: tp + fn = P
    val p = pr.head.getLong(1) + pr.head.getLong(3)
    assert(pr.forall(r => r.getLong(1) + r.getLong(3) === p))
  }

  test("calibration bins partition the corpus") {
    import org.apache.spark.sql.functions._
    val cal = TextOps.calibration(spark, "/root/testdata/sf0.001")
    val total = cal.agg(sum("n")).head().getLong(0)
    val docs = TextOps.docs(spark, "/root/testdata/sf0.001").count()
    assert(total === docs)
    assert(cal.filter(col("bin") < 0 || col("bin") >= TextOps.CalibBins).count() === 0L)
    assert(cal.filter(col("n_pos") > col("n")).count() === 0L)
  }

  test("corpus aucEval emits one sane row") {
    val r = TextOps.aucEval(spark, "/root/testdata/sf0.001").head()
    val (np, nn, num, den, auc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(np > 0 && nn > 0)
    assert(den === 2 * np * nn)
    assert(num >= 0 && num <= den)
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
