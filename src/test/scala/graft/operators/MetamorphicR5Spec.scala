package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams

/** Partition-invariance metamorphics and empty-input robustness for
  * the round-5 operators — results must not depend on physical
  * layout, sketches must respect their algebra (CMS counts are
  * additive under duplication), and empty inputs must yield empty
  * outputs, not crashes. */
class MetamorphicR5Spec extends SparkTestBase {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def same(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  test("trending and trimmed mean are partition-invariant") {
    val ev = EventStreams.events(spark, dir)
    same(EventStreams.trending(ev),
      EventStreams.trending(ev.repartition(7, col("user_id"))))
    same(Olap.trimmedMean(spark, dir), Olap.trimmedMean(spark, dir))
  }

  test("CMS registers are layout-invariant and additive under duplication") {
    val keys = graft.sources.Tpch.table(spark, dir, "lineitem")
      .select(col("l_partkey").as("k"))
    val base = Sketch.cmsRegisters(keys)
    same(base, Sketch.cmsRegisters(keys.repartition(9)))
    // counting sketch algebra: doubling the stream doubles every cell
    same(base.withColumn("cnt", col("cnt") * 2),
      Sketch.cmsRegisters(keys.unionAll(keys)))
  }

  test("bloom probe and LPA are run-deterministic") {
    same(Sketch.bloomProbe(spark, dir), Sketch.bloomProbe(spark, dir))
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    same(Iterative.lpaRounds(sym, 3), Iterative.lpaRounds(sym.repartition(5), 3))
  }

  test("empty inputs flow through: trending, CMS, LPA") {
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(EventStreams.trending(emptyEv).count() === 0L)
    val noKeys = Seq.empty[Long].toDF("k")
    assert(Sketch.cmsRegisters(noKeys).count() === 0L)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Iterative.lpaRounds(noEdges, 2).count() === 0L)
  }
}
