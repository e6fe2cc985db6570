package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction runs as partition-batched typed
  * `mapPartitions` (the Scala analog of `mapInPandas` — one iterator
  * per partition, so per-batch setup like model/codec init happens
  * once per partition, not per row).
  *
  * The actual byte decoding is STUBBED (this container ships no image/
  * audio codecs): `StubDecoder` derives deterministic pseudo-features
  * from the raw bytes. The Spark-side plumbing — schema, encoders,
  * partitioning, batch shape, null handling — is real and tested, and
  * a real codec drops into `decode` without touching the plan.
  */
object Multimodal {

  /** Typed media row: the binary payload + metadata columns. */
  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, format: String)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      histogram: Array[Double], aspect_ratio: Double)

  /** STUB decode: deterministic 16-bin byte histogram (L1-normalized).
    * Replace with a real codec (JPEG decode → pixel stats, PCM decode →
    * spectral bins) — signature and batching stay identical. */
  def stubDecode(bytes: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    if (bytes != null && bytes.nonEmpty) {
      bytes.foreach(b => bins((b & 0xff) >> 4) += 1.0)
      val n = bytes.length.toDouble
      (0 until 16).foreach(i => bins(i) /= n)
    }
    bins
  }

  /** Partition-batched feature extraction. One pass per partition;
    * decoder state (codec/model handle) would be initialized once at
    * the top of the iterator lambda. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (codec handle, model session)
      rows.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = if (r.bytes == null) 0L else r.bytes.length.toLong,
          histogram = stubDecode(r.bytes),
          aspect_ratio = if (r.height != 0) r.width.toDouble / r.height else 0.0)
      }
    }
  }

  /** Metadata-only transforms stay declarative (no decode): */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(maxDim) / col("width"), lit(maxDim) / col("height"), lit(1.0))
    media
      .withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plan for video rows: one output row per sampled
    * frame index (explode of a sequence — no decode involved). */
  def frameSamplePlan(media: DataFrame, everyNFrames: Int, frameCountCol: String): DataFrame =
    media.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(frameCountCol) - 1, lit(0)), lit(everyNFrames))))

  /** Build a media table from any binary + metadata source. Images and
    * docs share the pipeline — kind drives the decoder choice. */
  def fromBinary(df: DataFrame, idCol: String, bytesCol: String, kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(bytesCol).cast("binary").as("bytes"),
      lit(0).as("width"), lit(0).as("height"),
      lit(0).as("sample_rate"), lit("raw").as("format"))
      .as[MediaRow]
  }
}
