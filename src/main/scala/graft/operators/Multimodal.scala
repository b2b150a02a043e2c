package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition over batches of rows (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage: one iterator per partition, library handles loaded
  * once per partition, vectorized work inside).
  *
  * The actual codec is a STUB — this container has no image/audio
  * libraries — but everything Spark-side is real and tested: the schema,
  * the binary encoding, the partition-iterator batch shape, and the
  * deterministic feature definition (byte histogram), which is simple
  * enough to mirror into the DuckDB oracle.
  *
  * Scale: feature extraction is embarrassingly parallel (mapPartitions, no
  * shuffle); downstream similarity joins reuse the Similarity operators.
  */
object Multimodal {

  val FeatureDim = 16

  /** Typed media row: opaque payload + metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           features: Array[Double])

  /** STUB decoder =========================================================
    * A real implementation would decode the image/audio payload here
    * (JPEG -> pixels, WAV -> samples) and derive model features. This
    * deterministic stand-in computes a normalized byte histogram folded to
    * `FeatureDim` buckets — real plumbing, fake decode.
    */
  def decodeFeaturesStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % FeatureDim) += 1.0
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < FeatureDim) { hist(j) /= payload.length; j += 1 }
    }
    hist
  }

  /** Synthesize a media table from `documents` (UTF-8 text bytes as the
    * opaque payload) — the testdata carries no real binary column.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      concat(lit("text/"), col("lang")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  case class FrameFeatures(media_id: Long, frame_idx: Long, mean_byte: Double)

  /** Frame-sampling geometry: fixed windows of `frameBytes` every
    * `hopBytes` over the payload (the audio/video frame-sample pattern).
    * Pure column arithmetic — narrow, shuffle-free, and simple enough to
    * mirror into a DuckDB oracle. Media shorter than one frame yield no
    * rows (sequence() would count DOWN for a negative frame count, hence
    * the explicit n_frames > 0 guard).
    */
  def frameIndex(media: DataFrame, frameBytes: Int, hopBytes: Int): DataFrame =
    media.select(col("media_id"), length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("n_frames",
        (floor((col("n_bytes") - frameBytes) / hopBytes) + 1).cast("long"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1)))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * hopBytes).as("frame_off"),
        lit(frameBytes.toLong).as("frame_len"), col("n_bytes"))

  /** Resize planning: fit (width, height) inside (maxW, maxH) preserving
    * aspect ratio, never upscaling — the metadata half of an image-resize
    * stage (the pixel resample itself is codec work, stubbed like decode).
    * Pure double arithmetic both engines compute identically.
    */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media
      .withColumn("scale", least(lit(1.0),
        lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height")))
      .withColumn("out_w",
        greatest(lit(1L), floor(col("width") * col("scale"))))
      .withColumn("out_h",
        greatest(lit(1L), floor(col("height") * col("scale"))))

  /** Per-frame STUB feature (mean byte value) via the same
    * partition-iterator batch shape as extractFeatures — a real codec would
    * decode samples per frame here.
    */
  def frameFeatures(spark: SparkSession, media: DataFrame,
                    frameBytes: Int, hopBytes: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val n = if (r.payload.length < frameBytes) 0
          else (r.payload.length - frameBytes) / hopBytes + 1
        (0 until n).iterator.map { i =>
          val off = i * hopBytes
          var s = 0L
          var k = 0
          while (k < frameBytes) { s += (r.payload(off + k) & 0xff); k += 1 }
          FrameFeatures(r.media_id, i.toLong, s.toDouble / frameBytes)
        }
      }
    }
  }

  /** Per-partition batch feature extraction (mapPartitions — the rows of a
    * partition stream through one iterator, mirroring a Pandas-UDF batch).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (load codec once)
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          decodeFeaturesStub(r.payload))
      }
    }
  }
}
