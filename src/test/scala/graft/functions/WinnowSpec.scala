package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TextOps

/** The monotonic-deque expression must equal the window-aggregate
  * selection it replaced (max(struct(−h, pos)) over a W-row frame,
  * then distinct) — including rightmost-tie behavior on equal hashes,
  * which adversarial constant strings exercise hard. */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  /** reference: the r8a window-aggregate form. */
  private def windowForm(corpus: DataFrame, k: Int, w: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val frame = byDoc.rowsBetween(-(w - 1), 0)
    corpus
      .select(col("doc_id"), posexplode(expr(s"graft_gram_hashes(text, $k)")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("h"))
      .withColumn("rn", row_number().over(byDoc))
      .withColumn("pick", max(struct((-col("h")).as("nh"), col("pos"))).over(frame))
      .filter(col("rn") >= w)
      .select(col("doc_id"), col("pick.pos").as("pos"), (-col("pick.nh")).as("h"))
      .distinct()
  }

  private def dequeForm(corpus: DataFrame, k: Int, w: Int): DataFrame =
    corpus
      .select(col("doc_id"), explode(expr(
        s"graft_winnow(graft_gram_hashes(text, $k), $w)")).as("packed"))
      .select(col("doc_id"),
        shiftright(col("packed"), 31).as("pos"),
        (col("packed").bitwiseAND(lit(2147483647L))).as("h"))

  test("deque selection equals window selection, incl. equal-hash runs") {
    TextOps.ensureRegistered(spark)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaaaaaaaa"),          // all grams equal → ties
      (3L, "abababababababababab"),             // period-2 ties
      (4L, "short"),                            // below k
      (5L, "exactlyk"),                         // one gram, below w windows
      (6L, "exactly k plus w minus one chars!"),
      (7L, "w123 w99887 w5 w4433221100 w6 w777 w88 w9999999"))
      .toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 4), (2, 3), (5, 1))) {
      val a = dequeForm(corpus, k, w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = windowForm(corpus, k, w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(a === b, s"k=$k w=$w")
    }
  }

  test("deque selection equals window selection on the real corpus") {
    TextOps.ensureRegistered(spark)
    val corpus = TextOps.docs(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val a = dequeForm(corpus, TextOps.WinnowK, TextOps.WinnowW)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = windowForm(corpus, TextOps.WinnowK, TextOps.WinnowW)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("selection is map-only: no exchange below the explode") {
    TextOps.ensureRegistered(spark)
    val plan = dequeForm(
      TextOps.docs(spark, "/root/testdata/sf0.001").select("doc_id", "text"),
      TextOps.WinnowK, TextOps.WinnowW)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("pair stage: doc-distinct is map-side; df count and index join share one fps exchange") {
    TextOps.ensureRegistered(spark)
    val corpus = TextOps.docs(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val plan = graft.operators.Dedup.winnowPairsOf(corpus)
      .queryExecution.executedPlan.toString
    // the packed path never plans a (doc_id, h) dedup aggregate — the
    // distinct lives inside array_distinct on the map side. The r8
    // form's distinct() was a corpus-wide HashAggregate over the
    // exploded positions (275.8M rows at the 1M-doc harness, the pair
    // phase's single largest stage); its reappearance is the
    // regression this pins out.
    assert(plan.contains("array_distinct"), plan.take(2000))
    assert(!plan.contains("keys=[doc_id"), plan.take(3000))
    // the only aggregates are the df count (keys=[h]) and the final
    // shared-count (keys=[a, b])
    assert(!plan.contains("keys=[a#") || plan.contains("keys=[h#"), plan.take(3000))
  }
}
