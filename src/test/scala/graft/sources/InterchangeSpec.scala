package graft.sources

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** CSV / JSON-lines round-trip fidelity against the parquet source of
  * truth: schema-on-write, micros timestamps, exact row equality. */
class InterchangeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema === b.schema)
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  test("orders round-trips through CSV bit-exactly (incl. timestamps)") {
    val orders = Tpch.table(spark, dir, "orders")
    val path = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Interchange.writeCsv(orders, path)
    assertSame(orders, Interchange.readCsv(spark, path, orders.schema))
  }

  test("CSV round-trip keeps empty string and NULL distinct") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "plain"), Row(2L, ""), Row(3L, null)),
      schema)
    val path = java.nio.file.Files.createTempDirectory("graft_csv_ne").toString
    Interchange.writeCsv(df, path)
    val back = Interchange.readCsv(spark, path, schema)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back(1L) === "plain")
    assert(back(2L) === "")       // NOT silently nulled
    assert(back(3L) === null)     // NOT the literal sentinel
  }

  test("events round-trips through JSON lines bit-exactly") {
    val events = graft.streaming.EventStreams.events(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_json").toString
    Interchange.writeJson(events, path)
    assertSame(events, Interchange.readJson(spark, path, events.schema))
  }

  test("CSV ingest lands to parquet and feeds a query unchanged") {
    val li = Tpch.table(spark, dir, "lineitem")
    val csvPath = java.nio.file.Files.createTempDirectory("graft_ing").toString
    val landPath = java.nio.file.Files.createTempDirectory("graft_land").toString
    Interchange.writeCsv(li, csvPath)
    val landed = Interchange.landToParquet(spark,
      Interchange.readCsv(spark, csvPath, li.schema), landPath)
    // the q01 aggregation over the landed copy equals the native one
    def q01(df: DataFrame) = {
      import org.apache.spark.sql.functions._
      df.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
    }
    assertSame(q01(li), q01(landed))
  }

  test("orders round-trips through ORC with schema and pushdown intact") {
    val orders = Tpch.table(spark, dir, "orders")
    val path = java.nio.file.Files.createTempDirectory("graft_orc").toString
    Interchange.writeOrc(orders, path)
    val back = Interchange.readOrc(spark, path)
    assertSame(orders, back)
    // typed columnar: a filter reaches the ORC scan as a pushed filter
    val plan = back.filter(back("o_orderkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"),
      s"no pushdown in ORC scan:\n$plan")
  }
}
