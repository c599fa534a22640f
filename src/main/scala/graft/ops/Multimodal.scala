package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §7.8 / builder brief): image/audio/video
  * as opaque `binary` columns with typed metadata, processed partition-wise.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * step is a clearly-marked deterministic STUB ([[fakeDecodeFeatures]]); the
  * Spark-side plumbing — schema, partition-wise batching, typed encoders,
  * explode-based frame sampling — is real and tested. Swapping the stub for a
  * JNI/onnx decoder changes one function body, not the plan shape.
  *
  * Scale posture: decode runs inside `mapPartitions` (one codec init per
  * partition, not per row); binary payloads never shuffle — features are
  * extracted first and the binary column dropped before any wide operation.
  */
object Multimodal {

  /** Typed media metadata carried next to the binary payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
                             nFrames: Int, sampleRateHz: Int)

  final case class MediaRow(media_id: Long, meta: MediaMeta, content: Array[Byte])

  final case class FeatureRow(media_id: Long, kind: String, features: Array[Float])

  /** Canonical media schema (what a real ingest would produce). */
  val mediaSchema: org.apache.spark.sql.types.StructType =
    Encoders.product[MediaRow].schema

  /** Test/demo helper: wrap text rows as fake media blobs (UTF-8 payload). */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String,
                     kind: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        MediaRow(id, MediaMeta(kind, 64, 64, 16, 16000), bytes)
      }
  }

  /** ===== STUB =====
    * Deterministic fake "decode + feature extract": a 16-bin normalized byte
    * histogram stands in for real decoded features. A production build
    * replaces ONLY this body with a codec call (e.g. JNI libjpeg / ffmpeg),
    * keeping the partition-wise batch shape.
    */
  def stubFeatures(bytes: Array[Byte], dims: Int = 16): Array[Float] = {
    val hist = new Array[Float](dims)
    if (bytes != null && bytes.nonEmpty) {
      bytes.foreach(b => hist(((b & 0xFF) * dims) / 256) += 1f)
      val n = bytes.length.toFloat
      (0 until dims).foreach(i => hist(i) /= n)
    }
    hist
  }

  /** Partition-wise feature extraction over binary payloads. The iterator
    * shape is the contract: codec state initializes once per partition, rows
    * stream through without materializing the partition.
    */
  def fakeDecodeFeatures(media: Dataset[MediaRow], dims: Int = 16): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // STUB: a real implementation would open the codec/session here, once.
      rows.map(r => FeatureRow(r.media_id, r.meta.kind, stubFeatures(r.content, dims)))
    }
  }

  /** Frame sampling plan for video rows: every `step`-th frame index, as pure
    * relational explode — no binary bytes move, only (id, frame_idx) rows.
    */
  def sampleFrames(media: Dataset[MediaRow], step: Int): DataFrame =
    media.toDF()
      .filter(col("meta.kind") === "video" && col("meta.nFrames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.nFrames") - 1, lit(step))).as("frame_idx"))

  /** Resize metadata transform (stub: real impl re-encodes `content`). */
  def resizeMeta(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }
}
