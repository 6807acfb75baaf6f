package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tpch

/** Record-level twin of the property graph — the physical schema the
  * reference's consistency checker operates on (SURVEY.md §1.2).
  *
  * Mirrors the reference's fixed-width record stores
  * (consistency-check/.../RecordType.java:22-28):
  *
  *  - node store:          `{id, inUse, nextRel, nextProp}`
  *    (NodeRecordCheck.java:29-57)
  *  - relationship store:  `{id, inUse, typeId, firstNode, secondNode,
  *    firstPrevRel, firstNextRel, secondPrevRel, secondNextRel, nextProp}`
  *    (RelationshipRecordCheck.java:34-37, RelationshipNodeField.java:33-110)
  *  - property store:      `{id, inUse, owner, prevProp, nextProp}` +
  *    a blocks table `{propId, idx, keyId, ptype, valueRef, vlen}`
  *    (PropertyRecordCheck.java:120-162)
  *  - dynamic string store `{id, inUse, length, nextBlock}`
  *    (DynamicRecordCheck.java:30-108)
  *  - rel-type / prop-key dictionaries `{id, inUse, nameId}` + name
  *    dynamic stores (NameRecordCheck.java:30-66)
  *
  * The stores are *derived* from the logical graph by pure arithmetic +
  * window functions — relationship prev/next chain pointers come from
  * lag/lead over (endpoint node, rel id), which replaces the reference's
  * doubly-linked lists with a shuffle-partitionable derivation (one
  * shuffle keyed by node id, the same key later joins need). Property
  * records chunk an entity's properties into records of ≤4 blocks;
  * string values longer than [[RecordSpec.BlockSize]] chars overflow
  * into chained dynamic blocks, exactly like the reference's dynamic
  * store chains.
  *
  * Every id is assigned by collision-free arithmetic (no driver-side
  * allocation, no monotonically_increasing_id), so the derivation is
  * deterministic at any scale and reproducible in the DuckDB oracle
  * ([[graft.oracle.RecordCtes]] generates the SQL twin from the same
  * [[RecordSpec]]).
  */
object RecordSpec {
  /** chars per dynamic block (reference: block-chained dynamic stores) */
  val BlockSize = 16
  /** property blocks per PropertyRecord (reference packs multiple
    * blocks per fixed-width property record) */
  val BlocksPerRecord = 4

  /** value-type codes for property blocks (reference PropertyType:
    * inlined primitives vs dynamic-store strings vs dynamic-store
    * arrays — the reference keeps STRING_PROPERTY and ARRAY_PROPERTY
    * as two separate dynamic stores, RecordType.java:22-28,
    * PropertyRecordCheck.java:128-162) */
  val TLong = 1; val TDouble = 2; val TShortString = 3; val TLongString = 4
  val TArray = 5

  /** One extra (non-name) property of a node kind.
    * `vlenExpr` is ANSI SQL over the source table's columns, shared
    * verbatim between Spark (`expr(...)`) and the DuckDB oracle. */
  final case class Extra(keyId: Int, seq: Int, ptype0: Int, vlenExpr: String)
  final case class KindProps(kindCode: Long, table: String, keyCol: String,
                             extras: Seq[Extra])

  import TpchGraph._
  /** Properties beyond `name` (key 0, carried by every node). */
  val extraProps: Seq[KindProps] = Seq(
    KindProps(Customer, "customer", "c_custkey", Seq(
      Extra(1, 1, TDouble, "0"),
      Extra(2, 2, TShortString, "length(c_mktsegment)"))),
    KindProps(Supplier, "supplier", "s_suppkey", Seq(
      Extra(1, 1, TDouble, "0"))),
    KindProps(Part, "part", "p_partkey", Seq(
      Extra(3, 1, TShortString, "length(p_brand)"),
      Extra(4, 2, TShortString, "length(p_type)"),
      Extra(5, 3, TLong, "0"),
      Extra(6, 4, TDouble, "0"),
      // ARRAY-typed property: 8 bytes per element, 1..5 elements —
      // chunked into the separate array dynamic store exactly like
      // long strings chunk into the string store
      Extra(12, 5, TArray, "8 * (p_partkey % 5 + 1)"))),
    KindProps(Order, "orders", "o_orderkey", Seq(
      Extra(7, 1, TShortString, "length(o_orderstatus)"),
      Extra(8, 2, TDouble, "0"))),
  )

  /** Relationship properties (reference: property chains hang off
    * nodes, relationships AND the NeoStore record through one shared
    * checker — PrimitiveRecordCheck.java:34, NeoStoreCheck.java:25).
    * Derived from rel-id arithmetic so the DuckDB oracle reproduces
    * them exactly: every rel carries `weight` (inlined long); rels
    * with id % [[RelNoteMod]] == 1 also carry `note`, a string of
    * 5 + id % 29 chars that overflows into the string dynamic store
    * when longer than a block — giving relationships their own
    * dynamic chains. */
  val RelWeightKey = 9
  val RelNoteKey = 10
  val RelNoteMod = 37

  /** The NeoStore pseudo-record: one well-known record (id 0, below
    * every entity id namespace) holding graph-wide properties — the
    * twin of the reference's NeoStore property chain
    * (NeoStoreCheck.java:25, graph props read at MasterImpl.java:96). */
  val NeoStoreId = 0L
  val NeoNameKey = 0
  val NeoTxKey = 11
  /** vlen of the neostore's `name` graph property ("graft-graph") */
  val NeoNameLen = 11L

  /** property-key dictionary (reference PropertyIndexRecord store) */
  val propKeys: Seq[(Int, String)] = Seq(
    0 -> "name", 1 -> "acctbal", 2 -> "mktsegment", 3 -> "brand",
    4 -> "type", 5 -> "size", 6 -> "retailprice", 7 -> "status",
    8 -> "totalprice", 9 -> "weight", 10 -> "note", 11 -> "tx_count",
    12 -> "sizes")

  /** relationship-type dictionary (reference RelationshipTypeRecord store) */
  val relTypes: Seq[(Int, String)] = Seq(
    0 -> "IN_REGION", 1 -> "IN_NATION", 2 -> "PLACED_BY",
    3 -> "HAS_PART", 4 -> "SUPPLIED_BY")

  /** Chunk a dictionary name into dynamic name-store records
    * `(id, inUse, length, nextBlock)` — driver-side twin of the
    * dynamic-store derivation, for the tiny literal dictionaries. */
  def nameBlocks(dictId: Int, name: String): Seq[(Long, Boolean, Long, Long)] = {
    val L = name.length
    val nb = (L + BlockSize - 1) / BlockSize
    (0 until nb).map { j =>
      val id = dictId.toLong * 8 + j
      val len = if (j < nb - 1) BlockSize.toLong else (L - BlockSize * (nb - 1)).toLong
      val next = if (j < nb - 1) id + 1 else -1L
      (id, true, len, next)
    }
  }
}

/** The full record-store bundle the checker runs over. */
final case class Stores(
  nodes: DataFrame,     // id, in_use, next_rel, next_prop
  rels: DataFrame,      // id, in_use, type_id, first_node, second_node,
                        //   first_prev, first_next, second_prev, second_next, next_prop
  neo: DataFrame,       // id, in_use, next_prop — the single NeoStore record
  props: DataFrame,     // id, in_use, owner, prev_prop, next_prop
  blocks: DataFrame,    // prop_id, idx, key_id, ptype, value_ref, vlen
  dyns: DataFrame,      // id, in_use, length, next_block (STRING store)
  arrays: DataFrame,    // id, in_use, length, next_block (ARRAY store)
  relTypes: DataFrame,  // id, in_use, name_id
  propKeys: DataFrame,  // id, in_use, name_id
  typeNames: DataFrame, // id, in_use, length, next_block
  keyNames: DataFrame   // id, in_use, length, next_block
) {
  /** Persist every store. The full check unions ~20 join branches
    * over the same stores and Spark does not dedupe common subtrees
    * across union branches — an unpersisted bundle (e.g. a freshly
    * restored backup) is otherwise re-read once per branch. */
  def persistAll(): Stores = {
    // collect-then-foreach: Iterator.collect alone is LAZY — a bare
    // `collect { case d => d.persist() }` never runs the side effect
    // (the restored bundle then re-reads parquet once per check branch)
    productIterator.collect { case d: DataFrame => d }.foreach(_.persist())
    this
  }

  /** Release every store's cache (non-blocking). */
  def unpersistAll(): Unit =
    productIterator.collect { case d: DataFrame => d }.foreach(_.unpersist(false))
}

object RecordStores {
  import RecordSpec._

  /** Memoized, persisted derivation: the full check unions ~20
    * join-based checks over the same five stores, and Spark does not
    * dedupe common subtrees across union branches — without persistence
    * the derivation would execute once PER BRANCH. One cached
    * derivation per sf dir (dimension stores are literal, no need). */
  private val cached = new graft.SessionMemo[Stores]
  private def slog(msg: => String): Unit =
    if (sys.env.contains("GRAFT_ITER_LOG"))
      println(f"[stores] t=${System.currentTimeMillis() % 1000000}%d $msg")
  def deriveCached(spark: SparkSession, dir: String): Stores =
    cached.getOrElseUpdate(spark, dir) {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      slog("deriveCached enter")
      // tap persists the shared intermediates (rels-with-ids, incidence
      // windows, prop rows): five stores otherwise re-derive them once
      // each during cache fill
      val taps = scala.collection.mutable.ArrayBuffer[DataFrame]()
      val s = derive(spark, dir, tap = { d => val p = d.persist(); taps += p; p })
      slog("derive() plan built")
      // taps arrive in derive() call order: rels-with-ids, propRows,
      // incidence (the last tapped inside assemble()). incidence depends
      // on rels; propRows is independent — fill the two chains
      // concurrently, then materialize the five stores in parallel (all
      // shared subtrees cached by then, so no branch races another's
      // work).
      val Seq(rels0, rows, incPN) = taps.toSeq
      Await.result(Future.sequence(Seq(
        Future { rels0.count(); slog("tap rels0 filled")
                 incPN.count(); slog("tap inc filled") },
        Future { rows.count(); slog("tap rows filled") })), Duration.Inf)
      // Each store ends in repartition-by-id + eager localCheckpoint:
      // the checkpoint truncates the derivation out of the logical plan
      // (the ~20 checker joins — and every later query over the stores —
      // would otherwise re-run Catalyst analysis over the whole
      // derivation tree per query, which costs more than the joins at
      // this scale), and LogicalRDD keeps the hash partitioning, so
      // pointer joins building on id skip one exchange.
      val ckpt = Await.result(Future.sequence(Seq(
        "nodes" -> s.nodes.repartition(col("id")),
        "rels" -> s.rels.repartition(col("id")),
        "props" -> s.props.repartition(col("id")),
        "blocks" -> s.blocks.repartition(col("prop_id")),
        "dyns" -> s.dyns.repartition(col("id")),
        "arrays" -> s.arrays.repartition(col("id"))
      ).map { case (n, df) => Future {
        val t0 = System.nanoTime()
        val c = df.localCheckpoint(true)
        slog(f"$n fill ${(System.nanoTime() - t0) / 1e9}%.2fs")
        n -> c
      } }), Duration.Inf).toMap
      // stores are now self-contained RDDs; the tap caches only served
      // the fill and would otherwise hold memory for the whole session
      // (neo is a one-row literal — nothing to checkpoint)
      taps.foreach(_.unpersist())
      slog("fills done")
      s.copy(nodes = ckpt("nodes"), rels = ckpt("rels"),
        props = ckpt("props"), blocks = ckpt("blocks"), dyns = ckpt("dyns"),
        arrays = ckpt("arrays"))
    }

  /** prop_rows: one row per (entity, property) with only structural
    * fields — (owner, key_id, seq, ptype, value_ref, vlen). Values
    * themselves never enter the record stores (the checker validates
    * structure, not content — PropertyRecordCheck.java:128-162).
    * Owners span all three primitive kinds the reference's shared
    * checker walks (PrimitiveRecordCheck.java:34): nodes, relationships
    * (weight on every rel, an overflowing note on a deterministic
    * subset) and the NeoStore record (graph properties). */
  /** max property seq per owner, known STATICALLY per owner kind (the
    * property sets are spec data, and seqs are dense 0..max): lets the
    * record chunking below run shuffle-free — no distinct, no window. */
  private val maxSeqByTable: Map[String, Int] =
    extraProps.map(kp => kp.table -> kp.extras.map(_.seq).max).toMap
  private val kindNameToTable = Map(
    "customer" -> "customer", "supplier" -> "supplier",
    "part" -> "part", "order" -> "orders")

  def propRows(spark: SparkSession, dir: String, rels: DataFrame): DataFrame = {
    // name branch: owner's max seq depends on its kind (0 for kinds
    // with no extras)
    val nameMaxSeq = kindNameToTable.foldLeft(lit(0)) { case (acc, (kind, t)) =>
      when(col("kind") === kind, lit(maxSeqByTable(t))).otherwise(acc)
    }
    val name = TpchGraph.nodes(spark, dir).select(
      col("id").as("owner"), lit(0).as("key_id"), lit(0).as("seq"),
      lit(TShortString).as("ptype0"), length(col("name")).cast("long").as("vlen"),
      nameMaxSeq.as("max_seq"))
    val extras = extraProps.flatMap { kp =>
      val t = Tpch.table(spark, dir, kp.table)
      kp.extras.map { e =>
        t.select(
          (lit(kp.kindCode * TpchGraph.Base) + col(kp.keyCol)).as("owner"),
          lit(e.keyId).as("key_id"), lit(e.seq).as("seq"),
          lit(e.ptype0).as("ptype0"), expr(e.vlenExpr).cast("long").as("vlen"),
          lit(maxSeqByTable(kp.table)).as("max_seq"))
      }
    }
    val relMaxSeq = when(col("id") % RelNoteMod === 1, lit(1)).otherwise(lit(0))
    val relWeight = rels.select(col("id").as("owner"),
      lit(RelWeightKey).as("key_id"), lit(0).as("seq"),
      lit(TLong).as("ptype0"), lit(0L).as("vlen"), relMaxSeq.as("max_seq"))
    val relNote = rels.filter(col("id") % RelNoteMod === 1)
      .select(col("id").as("owner"), lit(RelNoteKey).as("key_id"),
        lit(1).as("seq"), lit(TShortString).as("ptype0"),
        (lit(5L) + col("id") % 29).as("vlen"), lit(1).as("max_seq"))
    import spark.implicits._
    val neoRows = Seq(
      (NeoStoreId, NeoNameKey, 0, TShortString, NeoNameLen, 1),
      (NeoStoreId, NeoTxKey, 1, TLong, 0L, 1))
      .toDF("owner", "key_id", "seq", "ptype0", "vlen", "max_seq")
    (name +: extras :+ relWeight :+ relNote :+ neoRows).reduce(_ unionAll _)
      .withColumn("ptype",
        when(col("ptype0") === TShortString && col("vlen") > BlockSize,
          lit(TLongString)).otherwise(col("ptype0")))
      .withColumn("value_ref",
        when(col("ptype") === TLongString || col("ptype") === TArray,
          (col("owner") * 16 + col("key_id")) * 8).otherwise(lit(-1L)))
      .drop("ptype0")
  }

  /** Incidence list with chain pointers: for each (node, rel) pair the
    * prev/next relationship in that node's chain (rel-id order). One
    * window shuffle keyed by node — scales as a single exchange.
    *
    * A loop relationship (src == dst) participates ONCE in its node's
    * chain: melting it twice would put two identical (node, rel_id)
    * window rows back-to-back and break pointer reciprocity. Its
    * second-side pointers mirror the first side (see [[assemble]]). */
  def incidence(rels: DataFrame): DataFrame = {
    val inc = rels.select(col("src").as("node"), col("id").as("rel_id"), lit(0).as("side"))
      .unionAll(rels.filter(col("src") =!= col("dst"))
        .select(col("dst").as("node"), col("id").as("rel_id"), lit(1).as("side")))
    val w = Window.partitionBy("node").orderBy("rel_id")
    inc.select(col("node"), col("rel_id"), col("side"),
      lag("rel_id", 1, -1).over(w).as("prev"),
      lead("rel_id", 1, -1).over(w).as("next"))
  }

  def typeIdExpr(typeCol: String): org.apache.spark.sql.Column =
    relTypes.foldLeft(when(lit(false), lit(-1))) { case (acc, (id, nm)) =>
      acc.when(col(typeCol) === nm, lit(id))
    }.otherwise(lit(-1))

  def derive(spark: SparkSession, dir: String,
             tap: DataFrame => DataFrame = identity): Stores = {
    val rels0 = tap(TpchGraph.rels(spark, dir))
    val g = PropertyGraph(TpchGraph.nodes(spark, dir), rels0)
    val rows = tap(propRows(spark, dir, g.rels))
    assemble(spark, g.nodes,
      g.rels.withColumn("type_id", typeIdExpr("type")), rows,
      relTypes, propKeys, tap = tap)
  }

  /** Generic record-store assembly from ANY property graph:
    * `nodes0(id, …)`, `rels1(id, src, dst, type_id, …)`, property
    * `rows(owner, key_id, seq, ptype, value_ref, vlen, max_seq)` plus
    * literal dictionaries. [[derive]] feeds it the TPC-H graph;
    * [[graft.checker.ScaleCheck]] feeds it the reference's canonical
    * generated perf workload (10M nodes / 30M rels / 40M props —
    * enterprise-performance-tests/.../ConsistencyPerformanceCheck.java:76-86).
    *
    * `relNextProp` is the relationship store's property-chain head
    * column: TPC-H rels all carry `weight`, chained at id*4; generated
    * workloads carry node properties only (`-node_properties`), so their
    * rel records point at NIL. */
  def assemble(spark: SparkSession, nodes0: DataFrame, rels1: DataFrame,
               rows: DataFrame,
               relTypeDict: Seq[(Int, String)],
               propKeyDict: Seq[(Int, String)],
               relNextProp: org.apache.spark.sql.Column = col("id") * 4,
               tap: DataFrame => DataFrame = identity): Stores = {
    val incPN = tap(incidence(rels1))

    // loops have no side-1 incidence row: their second-side pointers
    // mirror the first side (one chain position, both record slots)
    val chain = incPN.groupBy("rel_id").agg(
      max(when(col("side") === 0, col("prev"))).as("first_prev"),
      max(when(col("side") === 0, col("next"))).as("first_next"),
      coalesce(max(when(col("side") === 1, col("prev"))),
        max(when(col("side") === 0, col("prev")))).as("second_prev"),
      coalesce(max(when(col("side") === 1, col("next"))),
        max(when(col("side") === 0, col("next")))).as("second_next"))

    // when rels own properties their chain head is id*4 — the same
    // arithmetic as nodes (PrimitiveRecordCheck walks both)
    val relRecs = rels1
      .join(chain, rels1("id") === chain("rel_id"))
      .select(rels1("id"), lit(true).as("in_use"), col("type_id"),
        col("src").as("first_node"), col("dst").as("second_node"),
        col("first_prev"), col("first_next"),
        col("second_prev"), col("second_next"),
        relNextProp.as("next_prop"))

    val minRel = incPN.groupBy("node").agg(min("rel_id").as("min_rel"))
    val nodeRecs = nodes0
      .join(minRel, nodes0("id") === minRel("node"), "left")
      .select(nodes0("id"), lit(true).as("in_use"),
        coalesce(col("min_rel"), lit(-1L)).as("next_rel"),
        (nodes0("id") * 4).as("next_prop"))

    // property records: chunk into records of ≤4 blocks, doubly linked.
    // One record per 4 dense seqs — the rows with seq % 4 == 0 ARE the
    // record set (seqs are dense per owner by construction), and the
    // chain end comes from the statically-known max_seq: zero shuffles,
    // where a distinct + max-window would shuffle the full prop rows
    // twice (the oracle keeps the window form; values are identical)
    val propRecs = rows.filter(col("seq") % 4 === 0)
      .select((col("owner") * 4 + expr("seq div 4")).as("id"),
        lit(true).as("in_use"), col("owner"),
        when(expr("seq div 4") === 0, lit(-1L))
          .otherwise(col("owner") * 4 + expr("seq div 4") - 1).as("prev_prop"),
        when(expr("seq div 4") === expr("max_seq div 4"), lit(-1L))
          .otherwise(col("owner") * 4 + expr("seq div 4") + 1).as("next_prop"))

    val blocks = rows.select(
      (col("owner") * 4 + expr("seq div 4")).as("prop_id"),
      expr("seq % 4").as("idx"),
      col("key_id"), col("ptype"), col("value_ref"), col("vlen"))

    // dynamic stores: chained 16-unit blocks for overflowing values.
    // STRING and ARRAY values chunk identically but live in SEPARATE
    // stores (reference RecordType STRING_PROPERTY vs ARRAY_PROPERTY),
    // so the same chunker runs per ptype.
    def chunked(ptypeCode: Int): DataFrame = rows
      .filter(col("ptype") === ptypeCode)
      .select(col("value_ref"), col("vlen"),
        expr(s"(vlen + ${BlockSize - 1}) div $BlockSize").as("nb"))
      .select(col("value_ref"), col("vlen"), col("nb"),
        explode(sequence(lit(0L), col("nb") - 1)).as("j"))
      .select((col("value_ref") + col("j")).as("id"), lit(true).as("in_use"),
        when(col("j") < col("nb") - 1, lit(BlockSize.toLong))
          .otherwise(col("vlen") - lit(BlockSize) * (col("nb") - 1)).as("length"),
        when(col("j") < col("nb") - 1, col("value_ref") + col("j") + 1)
          .otherwise(lit(-1L)).as("next_block"))
    val dyns = chunked(TLongString)
    val arrays = chunked(TArray)

    // dictionaries + their name dynamic stores (dimension-sized: S4 —
    // the reference materializes these wholly, FullCheck.java:127-142;
    // here they are literal DFs that Catalyst broadcast-joins)
    import spark.implicits._
    val relTypesDF = relTypeDict.map { case (i, _) => (i.toLong, true, i.toLong * 8) }
      .toDF("id", "in_use", "name_id")
    val propKeysDF = propKeyDict.map { case (i, _) => (i.toLong, true, i.toLong * 8) }
      .toDF("id", "in_use", "name_id")
    val typeNamesDF = relTypeDict.flatMap { case (i, n) => nameBlocks(i, n) }
      .toDF("id", "in_use", "length", "next_block")
    val keyNamesDF = propKeyDict.flatMap { case (i, n) => nameBlocks(i, n) }
      .toDF("id", "in_use", "length", "next_block")
    // the single NeoStore record: graph properties chain from id 0
    // (below every entity namespace, so owner arithmetic stays
    // collision-free) — NeoStoreCheck.java:25
    val neoDF = Seq((NeoStoreId, true, NeoStoreId * 4))
      .toDF("id", "in_use", "next_prop")

    Stores(nodeRecs, relRecs, neoDF, propRecs, blocks, dyns, arrays,
      relTypesDF, propKeysDF, typeNamesDF, keyNamesDF)
  }
}
