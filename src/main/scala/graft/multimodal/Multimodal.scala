package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in bounded batches.
  *
  * The decode step is a clearly-marked deterministic STUB (this container
  * has no image/audio codecs); the Spark-side plumbing — schema, encoder,
  * partition-batched processing, metadata extraction — is real. Swapping
  * `stubDecode` for a JNI/javacv decoder keeps every plan shape intact.
  */
object Multimodal {

  final case class MediaFile(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedMeta(media_id: Long, kind: String, n_bytes: Int,
                               width: Int, height: Int, checksum: Long)
  final case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would parse the container header instead.
    */
  private def stubDecode(m: MediaFile): DecodedMeta = {
    var crc = 0L
    var i = 0
    while (i < m.payload.length) { crc = crc * 31 + (m.payload(i) & 0xff); i += 1 }
    DecodedMeta(m.media_id, m.kind, m.payload.length,
      width = 16 + (math.abs(crc) % 1024).toInt,
      height = 16 + (math.abs(crc / 7) % 1024).toInt,
      checksum = crc)
  }

  /** Synthesize a media table from any (id, text) table — payload = UTF-8
    * bytes, kind round-robins image/audio/video. Stands in for a real
    * binary source (`spark.read.format("binaryFile")`) in tests.
    */
  def synthesizeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("payload"))

  /** Decode / feature-extract over partitions: the per-partition iterator
    * keeps memory bounded (one payload at a time), the narrow map keeps
    * the operator shuffle-free and partition-parallel.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map(stubDecode))
  }

  /** Frame sampling plumbing for video payloads: emits every `stride`-th
    * fixed-size slice of the payload as a "frame" (stub for codec-level
    * frame extraction). flatMap keeps it narrow; output size is bounded by
    * payload/frameBytes/stride per row.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaFile].flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) => Frame(m.media_id, idx, chunk) }
    }
  }

  /** "Resize" plumbing: truncate/pad payload to a target byte budget —
    * stands in for image resize while exercising binary-column transforms
    * in pure SQL functions (substr on binary stays in codegen).
    */
  def resizePayload(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("payload_resized",
      substring(col("payload"), 1, targetBytes))
      .withColumn("resized_bytes", length(col("payload_resized")))

  final case class Features(media_id: Long, features: Array[Double])

  /** Feature extraction over binary payloads: normalized byte histogram
    * (`bins` buckets over 0..255) — a real, computable feature (unlike the
    * stubbed codec decode), in the same bounded mapPartitions batch shape
    * a model-based embedder would use. Pure narrow map, no shuffle.
    */
  def byteHistogram(spark: SparkSession, media: DataFrame,
                    bins: Int = 16): Dataset[Features] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map { m =>
      val h = new Array[Double](bins)
      m.payload.foreach { b => h(((b & 0xff) * bins) / 256) += 1.0 }
      val n = math.max(m.payload.length, 1).toDouble
      Features(m.media_id, h.map(_ / n))
    })
  }
}
