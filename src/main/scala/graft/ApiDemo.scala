package graft

import org.apache.spark.sql.SparkSession

import graft.operators.EngineSession

/** Minimal end-to-end drive of the embedded write API (G1-G13) — run
  * with `sbt "runMain graft.ApiDemo"`. Exists as living usage
  * documentation for the EngineSession surface. */
object ApiDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val s = new EngineSession(spark)
    val tx = s.beginTx()
    val alice = tx.createNode(); val bob = tx.createNode()
    tx.createRelationship(alice, bob, "KNOWS")
    tx.setProperty(alice, "name", "alice")
    tx.success(); tx.finish()

    println(s"[demo] snapshot: ${s.snapshot}")
    println(s"[demo] expand alice OUTGOING KNOWS: ${s.relationships(alice, Set("KNOWS"), "OUTGOING")}")
    try tx.setProperty(alice, "x", "y")
    catch { case e: Exception => println(s"[demo] outside-tx rejected: ${e.getMessage}") }
    val tx2 = s.beginTx(); tx2.delete(alice); tx2.success()
    try tx2.finish()
    catch { case e: Exception => println(s"[demo] referential guard: ${e.getMessage}") }
    // an aborted commit must leave the graph untouched and the session usable
    println(s"[demo] alice survives abort: ${s.hasNode(alice)}")
    val tx3 = s.beginTx(); val carol = tx3.createNode()
    tx3.setProperty(carol, "name", "carol"); tx3.success(); tx3.finish()
    println(s"[demo] post-abort tx committed: ${s.nodeById(carol)}")
    s.nodesDF.show(false)
    spark.stop()
  }
}
