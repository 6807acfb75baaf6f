package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats beyond the native parquet: CSV and JSON-lines
  * read/write with schema round-trip fidelity.
  *
  * Parquet is the engine's storage format (typed, columnar, splittable,
  * stats for pushdown); CSV/JSON are the ingest/egress edges every
  * deployment has. Both are line-splittable so a 100 TB ingest
  * parallelizes per-file/per-split exactly like the parquet path — the
  * cost difference is parsing (no column pruning, no stats), which is
  * why [[landToParquet]] exists: read the interchange format ONCE,
  * land it as parquet, and run every downstream query against the
  * landed copy.
  *
  * Timestamps survive the round-trip at micros precision via an
  * explicit ISO format with offset; the reader takes the WRITER's
  * schema (schema-on-write), never inference, so types are stable
  * across engines and file shuffles do not re-order columns.
  */
object Interchange {
  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** TIMESTAMP_NTZ (parquet timestamps without isAdjustedToUTC, the
    * testdata's `ts` columns) is formatted by the SEPARATE
    * `timestampNTZFormat` option — `timestampFormat` only governs
    * TZ-aware values, and the NTZ default silently truncates to
    * millis. Both are set symmetrically so either flavor survives at
    * micros. */
  private val TsNtzFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  /** NULL sentinel distinct from the empty field: with Spark's default
    * (nullValue = emptyValue = the empty field) a non-null empty
    * string written by [[writeCsv]] reads back as NULL. Writing NULL
    * as `\N` (the classic mysqldump/Hive convention) and empty string
    * as a quoted `""` keeps the two distinguishable in both
    * directions. */
  private val NullTok = "\\N"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", NullTok)
      .option("emptyValue", "\"\"")
      .option("timestampFormat", TsFmt)
      .option("timestampNTZFormat", TsNtzFmt)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", NullTok)
      .option("emptyValue", "")
      .option("timestampFormat", TsFmt)
      .option("timestampNTZFormat", TsNtzFmt)
      .schema(schema)
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", TsFmt)
      .option("timestampNTZFormat", TsNtzFmt)
      .json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", TsFmt)
      .option("timestampNTZFormat", TsNtzFmt)
      .schema(schema)
      .json(path)

  /** ORC: the other typed columnar format a warehouse migration brings
    * along (Hive estates). Spark ships the reader/writer natively;
    * unlike CSV/JSON the schema and stats travel in the file, so no
    * schema-on-write contract is needed and predicate pushdown works
    * the same as parquet (`PushedFilters` in the scan). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Ingest pattern: interchange file → typed parquet landing table.
    * Returns the landed DataFrame (reading the parquet copy). */
  def landToParquet(spark: SparkSession, src: DataFrame, dest: String): DataFrame = {
    src.write.mode("overwrite").parquet(dest)
    spark.read.parquet(dest)
  }
}
