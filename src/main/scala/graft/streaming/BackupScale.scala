package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.checker.{FullCheck, ScaleCheck}
import graft.model.Stores

/** The reference's full-then-incremental backup lifecycle at the
  * canonical perf-test scale — TestBackup.java:220 (multipleIncrementals)
  * and :367 (full → changes → incremental → verify) run against a
  * ScaleCheck-sized generated store instead of a fixture.
  *
  * Store "growth" between increments is modeled by id-prefix slices of
  * the fully generated bundle: record stores are append-only
  * derivations (ids are collision-free arithmetic, never reassigned),
  * so `id ≤ cut` is exactly the store as of an earlier time — the same
  * contract [[Backup.incrementalStores]]'s per-store watermarks ride.
  * Lifecycle: full backup at 70% of each store, three incrementals at
  * 80/90/100%, then restore + full consistency check (BackupService
  * .java:99-102: never trust a backup until the restored copy checks
  * clean).
  *
  * `runMain graft.streaming.BackupScale [nodeCount]` prints one JSON
  * line: per-phase walls, shipped rows per incremental, replay
  * records/s (shipped ÷ incremental wall), verify records/s.
  */
object BackupScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "target/backup_scale"
    // fresh lifecycle per run
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete(); ()
    }
    rm(new java.io.File(dir))

    val t0 = System.nanoTime()
    val s0 = ScaleCheck.stores(spark, n)
    val stores = s0.copy(
      nodes = s0.nodes.persist(StorageLevel.MEMORY_AND_DISK),
      rels = s0.rels.persist(StorageLevel.MEMORY_AND_DISK),
      props = s0.props.persist(StorageLevel.MEMORY_AND_DISK),
      blocks = s0.blocks.persist(StorageLevel.MEMORY_AND_DISK),
      dyns = s0.dyns.persist(StorageLevel.MEMORY_AND_DISK),
      arrays = s0.arrays.persist(StorageLevel.MEMORY_AND_DISK))
    // per-store max id, once — defines the prefix cuts
    val maxIds = Backup.storeSeq(stores).map { case (nm, df) =>
      nm -> df.agg(coalesce(max(col(Backup.storeIdCol(nm))), lit(-1L)))
        .head().getLong(0)
    }.toMap
    val genSec = (System.nanoTime() - t0) / 1e9

    def slice(frac: Double): Stores = {
      def cut(nm: String, df: DataFrame): DataFrame =
        df.filter(col(Backup.storeIdCol(nm)) <=
          (maxIds(nm) * frac).toLong)
      stores.copy(
        nodes = cut("nodes", stores.nodes),
        rels = cut("rels", stores.rels),
        neo = cut("neo", stores.neo),
        props = cut("props", stores.props),
        blocks = cut("blocks", stores.blocks),
        dyns = cut("dyns", stores.dyns),
        arrays = cut("arrays", stores.arrays),
        relTypes = cut("rel_types", stores.relTypes),
        propKeys = cut("prop_keys", stores.propKeys),
        typeNames = cut("type_names", stores.typeNames),
        keyNames = cut("key_names", stores.keyNames))
    }

    val tf = System.nanoTime()
    Backup.fullStores(slice(0.7), dir)
    val fullSec = (System.nanoTime() - tf) / 1e9

    val incs = Seq(0.8, 0.9, 1.0).map { frac =>
      val ti = System.nanoTime()
      val shipped = Backup.incrementalStores(slice(frac), dir)
      val sec = (System.nanoTime() - ti) / 1e9
      (frac, shipped.values.sum, sec)
    }
    val shippedTotal = incs.map(_._2).sum
    val incSecTotal = incs.map(_._3).sum

    val tv = System.nanoTime()
    val restored = Backup.restoreStores(spark, dir)
    val violations = FullCheck.violations(restored).count()
    val verifySec = (System.nanoTime() - tv) / 1e9
    val elements = n + 3 * n + 4 * n

    def r1(d: Double) = BigDecimal(d).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    val incJson = incs.map { case (f, rows, sec) =>
      s"""{"frac":$f,"rows":$rows,"sec":${r1(sec)}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"backup_scale","nodes":$n,"gen_sec":${r1(genSec)},""" +
      s""""full_sec":${r1(fullSec)},"incrementals":$incJson,""" +
      s""""replay_records_per_s":${r1(shippedTotal / incSecTotal)},""" +
      s""""verify_sec":${r1(verifySec)},"verify_records_per_s":${r1(elements / verifySec)},""" +
      s""""violations":$violations}""")
    spark.stop()
  }
}
