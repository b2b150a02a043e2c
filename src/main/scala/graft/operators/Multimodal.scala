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
