package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, plus
  * partition-parallel decode / feature-extract / resize / frame-sample
  * transforms.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this container); everything Spark-side — schema, batch shape,
  * partition-parallel execution, output contract — is real. Swap
  * `stubDecode*` for a JNI/codec call and nothing else changes.
  *
  * Scale notes: media transforms run via `mapPartitions` so per-partition
  * setup (codec init, model load) amortizes across rows — the Scala analog
  * of `mapInPandas` batch processing. Binary payloads never shuffle: all
  * transforms are map-only; metadata-only projections prune the `bytes`
  * column at the parquet scan.
  */
object Multimodal {

  /** media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType),
    ))),
  ))

  final case class MediaRow(media_id: Long, kind: String, mime: String,
                            bytes: Array[Byte], width: Int, height: Int)

  final case class MediaFeatures(media_id: Long, kind: String,
                                 feature: Array[Float], n_bytes: Long)

  final case class FrameSample(media_id: Long, frame_idx: Int,
                               frame_bytes: Array[Byte])

  /** STUB decode: deterministic 64-bin byte histogram as the "decoded
    * feature vector". A real deployment replaces the body with an actual
    * image/audio decoder; the signature and the partition-batch execution
    * model are the production shape. */
  private[multimodal] def stubDecodeFeature(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](64)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) / 4) += 1f; i += 1 }
      val n = math.max(bytes.length, 1)
      var j = 0
      while (j < 64) { hist(j) /= n; j += 1 }
    }
    hist
  }

  /** Feature extraction over the media table: map-only, per-partition
    * batched. Prunes to the columns it needs before the heavy step. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes")).as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec/model load)
        rows.map { case (id, kind, bytes) =>
          MediaFeatures(id, kind, stubDecodeFeature(bytes),
            if (bytes == null) 0L else bytes.length.toLong)
        }
      }
  }

  /** STUB resize: keeps a deterministic prefix proportional to the target
    * area (stands in for a real pixel resample). */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    val resized = media
      .select(col("media_id"), col("bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, w, h) =>
          val scale = if (w * h > 0)
            math.min(1.0, (targetW.toDouble * targetH) / (w.toDouble * h))
          else 1.0
          val keep = if (bytes == null) 0
            else math.max(1, (bytes.length * scale).toInt)
          (id, if (bytes == null) bytes else bytes.take(keep), targetW, targetH)
        }
      }.toDF("media_id", "bytes", "width", "height")
    resized
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk
    * as a "frame" (stub chunking; real impl seeks keyframes). Generates
    * multiple rows per input — flatMap shape, still map-only. */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameSize: Int = 1024,
                   stride: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else bytes.grouped(frameSize).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, idx) => FrameSample(id, idx, chunk) }
      }
  }

  /** Perceptual hash (aHash shape) over the decoded feature vector: bit
    * i set iff bin i exceeds the mean bin weight — stable under
    * payload-preserving re-encodes and padding (the normalized
    * distribution is what's hashed), which byte-level content hashes are
    * not. With the stub decoder this hashes the byte histogram; a real
    * decoder swaps in pixel/spectrogram features, same 64-bit shape. */
  private[multimodal] def perceptualHash(feature: Array[Float]): Long = {
    if (feature == null || feature.isEmpty) return 0L
    val mean = feature.sum / feature.length
    var acc = 0L
    var i = 0
    while (i < feature.length && i < 64) {
      if (feature(i) > mean) acc |= (1L << i)
      i += 1
    }
    // Degenerate (zero-variance) feature: no bin strictly exceeds the mean
    // (e.g. an exactly-uniform histogram), so the threshold hash carries no
    // signal and every such vector would collide at 0 — unrelated media
    // reported as exact duplicates. Fall back to a content hash of the
    // feature bits: identical degenerate features still pair as exact
    // copies, distinct ones no longer collide (mirrors the n_bytes == 0
    // guard in [[nearDupMediaPairs]]).
    if (acc == 0L) {
      var h = 0xcbf29ce484222325L // FNV-1a offset basis, 64-bit fold
      i = 0
      while (i < feature.length) {
        h = (h ^ java.lang.Float.floatToIntBits(feature(i)).toLong) *
          0x100000001b3L
        i += 1
      }
      h
    } else acc
  }

  /** Near-duplicate media detection: decode (stub) → 64-bit perceptual
    * hash, both map-only, then the pigeonhole-banded Hamming pair join
    * shared with text SimHash ([[graft.ops.Dedup.hammingPairs]]) — the
    * image-dedup pass an LLM multimodal pipeline runs before training.
    * Binary payloads never shuffle: only (media_id, 8-byte hash) enters
    * the join. Exact copies always pair (identical bytes ⇒ identical
    * hash); near-dup recall follows the banding guarantee. */
  def nearDupMediaPairs(spark: SparkSession, media: DataFrame,
                        maxHammingDistance: Int = 2,
                        maxBucketSize: Int =
                          graft.ops.Dedup.DefaultHammingBucketCap): DataFrame = {
    import spark.implicits._
    // payload-less media (null/empty bytes) all hash to the same empty
    // histogram: content comparison is meaningless there, and without
    // the guard every such pair would report as an exact duplicate
    val sigs = extractFeatures(spark, media)
      .filter(_.n_bytes > 0)
      .map(f => (f.media_id, perceptualHash(f.feature)))
      .toDF("media_id", "phash")
    graft.ops.Dedup.hammingPairs(sigs, "media_id", "phash",
      maxHammingDistance, maxBucketSize)
  }

  /** Metadata-only stats: never touches `bytes` — verify with explain()
    * that ReadSchema excludes the binary column. */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy("kind").agg(
      count(lit(1)).as("n"),
      avg(col("meta.width")).as("avg_width"),
      avg(col("meta.duration_ms")).as("avg_duration_ms"))

  /** Synthesize a deterministic media table for tests/demos. */
  def synthesize(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("kind"),
      lit("application/octet-stream").as("mime"),
      // deterministic pseudo-payload: sha-chain expanded bytes
      to_binary(repeat(sha2(col("id").cast("string"), 256),
        (col("id") % 7 + 1).cast("int")), lit("hex")).as("bytes"),
      struct(
        (col("id") % 640 + 16).cast("int").as("width"),
        (col("id") % 480 + 16).cast("int").as("height"),
        (col("id") * 33 % 60000).cast("bigint").as("duration_ms"),
        lit(16000).cast("int").as("sample_rate")).as("meta"))
  }
}
