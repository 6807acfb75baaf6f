package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tpch

/** Multimodal-column plumbing: media as opaque BINARY columns with
  * typed metadata, and a feature-extraction pass implemented as real
  * partition-level imperative code over the bytes.
  *
  * The decode step is a STUB by design (no image/audio codecs in this
  * environment): [[FakeDecoder]] computes deterministic per-blob
  * features (byte count, frame count, modular byte checksum) so the
  * Spark-side plumbing — binary schema, batched per-partition
  * processing, feature-struct output — is real and oracle-testable
  * (the corpus is ASCII, so the oracle recomputes the byte checksum
  * from character codes).
  */
object Media {
  val FrameBytes = 256
  val ChecksumMod = 997L

  /** media(doc_id, media BINARY, meta STRUCT<mime, n_chars>) — the
    * canonical multimodal table shape. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tpch.table(spark, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(lit("text/plain").as("mime"),
        length(col("text")).cast("long").as("n_chars")).as("meta"))

  /** The decode/extract stub: pure function over raw bytes. In a real
    * deployment this is the codec call; the batch shape (one call per
    * row inside mapPartitions, no driver involvement) is the real
    * plumbing under test. */
  object FakeDecoder {
    def features(bytes: Array[Byte]): (Long, Long, Long) = {
      val n = bytes.length.toLong
      val frames = n / FrameBytes + 1
      var acc = 0L
      var i = 0
      while (i < bytes.length) {
        acc = (acc + (bytes(i) & 0xff)) % ChecksumMod
        i += 1
      }
      (n, frames, acc)
    }
  }

  /** Frame sampling — the one-blob-to-many-rows expansion every video
    * pipeline needs (decode → sample every k-th frame → per-frame
    * features). The stub "frame" is a FrameBytes-sized byte window and
    * the extracted feature is its first byte; the REAL part is the
    * shape: a flatMap inside mapPartitions that multiplies rows without
    * driver involvement, keyed output (doc, frame) ready for a
    * per-frame feature join. */
  val FrameStride = 2

  /** per-blob frame expansion (exposed for the empty-blob spec):
    * floorDiv gives lastFrame = -1 on an empty blob → no frames
    * (Scala's truncating / would give 0 and index into bytes(0)) */
  private[operators] def frameRows(id: Long, bytes: Array[Byte]): Iterator[(Long, Long, Long)] = {
    val lastFrame = math.floorDiv(bytes.length - 1, FrameBytes)
    (0 to lastFrame by FrameStride).iterator.map { f =>
      (id, f.toLong, (bytes(f * FrameBytes) & 0xff).toLong)
    }
  }

  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => frameRows(id, bytes) })
      .toDF("doc_id", "frame_idx", "first_byte")
  }

  /** Resize — the third multimodal pass every image/video pipeline
    * needs (decode → resize → re-encode). The stub "resize" is a
    * deterministic byte-domain downsample: stride-sample the blob to a
    * fixed [[ThumbWidth]]-byte thumbnail (index i reads byte
    * ⌊i·n/w⌋ — nearest-neighbor downscaling in one dimension). The
    * REAL part is the shape: per-row binary → fixed-size binary inside
    * mapPartitions, exactly where a codec's scale call sits; the
    * output row carries scalar stats (length + position-weighted
    * checksum mod 997) so the oracle pins the thumbnail bytes. */
  val ThumbWidth = 64
  def resizeThumbs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val w = math.min(ThumbWidth, n)
          val thumb = Array.tabulate(w)(i => bytes((i.toLong * n / w).toInt))
          var acc = 0L
          var i = 0
          while (i < thumb.length) {
            acc = (acc + (thumb(i) & 0xff).toLong * (i + 1)) % ChecksumMod
            i += 1
          }
          (id, thumb.length.toLong, acc)
        }
      }
      .toDF("doc_id", "thumb_len", "thumb_checksum")
  }

  /** Feature extraction over the binary column via typed mapPartitions
    * — the distributed decode pass. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (n, frames, checksum) = FakeDecoder.features(bytes)
          (id, n, frames, checksum)
        }
      }
      .toDF("doc_id", "n_bytes", "n_frames", "checksum")
  }

  /** Modality routing — the demux every mixed-media lake runs first:
    * sniff each blob's magic byte, tag it with a modality, and land
    * per-modality partitions. The sniff is the decode-side stub
    * (first byte mod 4 → modality name); the REAL part is the shape —
    * classification happens next to the bytes in mapPartitions, and
    * only (modality, n_bytes) scalars reach the exchange, so routing
    * a petabyte of mixed blobs shuffles kilobytes. */
  val Modalities = Vector("text", "image", "audio", "video")
  def modalityRoute(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (_, bytes) =>
        val magic = if (bytes.isEmpty) 0 else bytes(0) & 0xff
        (Modalities(magic % Modalities.length), bytes.length.toLong)
      })
      .toDF("modality", "nbytes")
      .groupBy("modality")
      .agg(count(lit(1)).as("n_blobs"), sum("nbytes").as("total_bytes"))
  }

  /** Target shard payload in bytes (char-sized for the ASCII stub). */
  val ShardBytes = 2000L

  /** Shard assembly — packing blobs into ~fixed-size archive shards
    * (the webdataset/tar-shard step every multimodal loader consumes).
    * Deterministic: within each source, blobs are ordered by a mixed
    * hash (a reproducible shuffle, never `rand()`), the running byte
    * total assigns each blob to the shard its START offset falls in,
    * and the report carries per-shard blob counts and payload bytes.
    *
    * Scale shape: the running sum is a window PARTITIONED BY source —
    * packing is partition-local per source prefix (exactly how shard
    * writers run: one task per source slice, no global prefix scan, no
    * SinglePartition window). Straddling blobs go to the shard where
    * they start, so shard payloads can overshoot by at most one blob —
    * the greedy sequential-fill rule real shard writers use. */
  def shardPack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tpch.table(spark, dir, "documents")
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("nbytes"),
        pmod(col("doc_id") * Pipeline.SampleMult, lit(Pipeline.SampleMod)).as("h"))
      .withColumn("cum", sum("nbytes").over(w))
      .withColumn("shard", expr(s"(cum - nbytes) div ${ShardBytes}L"))
      .groupBy("source", "shard")
      .agg(count(lit(1)).as("n_blobs"), sum("nbytes").as("shard_bytes"))
  }
}
