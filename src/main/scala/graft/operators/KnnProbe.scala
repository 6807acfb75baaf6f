package graft.operators

import org.apache.spark.sql.functions._

/** Disposable diagnostic main for the capped knn path (not part of the
  * query surface): prints the executed plan and phase timings at a
  * given n. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = LlmScale.session("KnnProbe")
    TextOps.ensureRegistered(spark)
    val e = Similarity.withBucket(AnnScale.vectors(spark, n)).persist()
    e.count()
    var t0 = System.nanoTime()
    val g = Similarity.slicedGroups(
      e.select(col("vec_id"), col("q"), col("nrm"), col("bucket"))).persist()
    println(s"[probe] groups rows=${g.count()} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f")
    println(g.groupBy("key1", "slice").count()
      .agg(count(lit(1)), max("count"), avg("count")).head.toString)
    t0 = System.nanoTime()
    val cand = Similarity.knnCandidates(
      e.select(col("vec_id"), col("q"), col("nrm"), col("bucket")))
    println(s"[probe] cand rows=${cand.count()} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f")
    t0 = System.nanoTime()
    // forces every dot/cos through a codegen-friendly aggregate —
    // isolates pair-scoring cost from the top-k reduction's cost
    println(s"[probe] cos sum=${cand.agg(sum("cos")).head.getDouble(0)} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f")
    t0 = System.nanoTime()
    cand.sortWithinPartitions(col("key1"), col("slice"), col("qid"),
      col("cos").desc, col("nid"))
      .write.mode("overwrite").format("noop").save()
    println(f"[probe] sort-only wall=${(System.nanoTime() - t0) / 1e9}%.1f")
    t0 = System.nanoTime()
    val top = Similarity.knnTopK(
      e.select(col("vec_id"), col("q"), col("nrm"), col("bucket")),
      Similarity.KnnGraphK)
    top.explain("formatted")
    println(s"[probe] topk rows=${top.count()} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f")
    g.unpersist(); e.unpersist()
    spark.stop()
  }
}
