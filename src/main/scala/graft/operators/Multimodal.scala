package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode/feature-extract
  * passes.
  *
  * The container has no image/audio codecs, so the *decode kernel is a
  * deterministic stub* (clearly marked below) — the Spark-side contract
  * is real: schema, batching, partition behavior and the UDF signature
  * are exactly what a libjpeg/ffmpeg-backed kernel would plug into.
  */
object Multimodal {

  /** media table schema: the pattern for any blob modality. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Wrap any table with a binary payload column into the media shape.
    * (The driver testdata has no real blobs; documents' text bytes stand
    * in as the payload — the plumbing is payload-agnostic.)
    */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id", payloadCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast(BinaryType).as("blob"),
      struct(
        lit("application/octet-stream").as("mime"),
        (pmod(xxhash64(col(idCol)), lit(1920L)).cast("int") + 32).as("width"),
        (pmod(xxhash64(col(idCol), lit(1L)), lit(1080L)).cast("int") + 32).as("height"),
        length(col(payloadCol)).cast(LongType).as("n_bytes")).as("meta"))

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("byte_checksum", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Batched "decode + feature-extract" pass over blobs.
    *
    * Runs as mapPartitions with an explicit micro-batch (the shape a
    * vectorized decoder / GPU feature extractor needs); each batch would
    * be handed to the native kernel at once.
    *
    * STUB KERNEL: the per-blob "decode" below is a deterministic fake
    * (byte checksum + 8 pseudo-features from rolling byte sums). Replace
    * `decodeBatch` with a real codec binding to productionize — nothing
    * else changes.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val input = media.select(col("media_id"), col("blob"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        decodeBatch(batch.map(r => (r.getLong(0), if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1))))
      }
    }(RowEncoder.encoderFor(featureSchema))
  }

  /** Checksum modulus: keeps the rolling polynomial checksum inside
    * non-overflowing BIGINT range so external engines reproduce it.
    */
  val checksumMod = 1000000007L

  /** STUB: deterministic fake decoder. Real implementation would call
    * into a JNI/codec library once per batch.
    */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Row] =
    batch.map { case (id, bytes) =>
      var checksum = 0L
      val feat = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        checksum = (checksum * 31 + (bytes(i) & 0xFF)) % checksumMod
        feat(i % 8) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      Row(id, bytes.length.toLong, checksum, feat.toSeq)
    }

  /** "Resize" stub: recompute metadata for a bounded long edge; blob
    * passes through untouched (a real kernel would re-encode).
    */
  def resizeMeta(media: DataFrame, maxEdge: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = when(greatest(w, h) > maxEdge,
      lit(maxEdge).cast("double") / greatest(w, h).cast("double")).otherwise(lit(1.0))
    media.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      col("meta.n_bytes").as("n_bytes")))
  }

  /** Frame sampling stub for video-shaped payloads: emit every k-th
    * "frame index" row per media item (sequence+explode — a generator,
    * no UDF).
    */
  def sampleFrames(media: DataFrame, everyK: Int = 10, totalFramesCol: String = "n_frames"): DataFrame =
    media.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(totalFramesCol) - 1, lit(0)), lit(everyK))))
}
