package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns for a training-data pipeline: media as opaque
 * `binary` payloads with typed metadata, and a decode/feature-extract
 * stage that runs per-partition with a pluggable decoder.
 *
 * The decoder boundary is where a real deployment binds an image/audio
 * library; this container has none, so [[StubDecoder]] produces
 * deterministic pseudo-features derived from the payload bytes. The
 * Spark-side plumbing — schema, batch shape, partition-wise execution,
 * downstream similarity integration — is real and tested.
 *
 * mapPartitions (preference (d) in the custom-operator ladder) is the
 * right tool here and only here: decoding is genuinely imperative
 * per-row work against a native library whose handles should be opened
 * once per partition, not once per row — the same reason Python
 * pipelines use mapInPandas for this stage. Everything before and after
 * the decode stays in Catalyst expressions.
 */
object Multimodal {

  val Kinds = Seq("image", "audio", "video")

  /** Media table schema: id, kind, opaque payload, typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate_hz", IntegerType)))

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, sample_rate_hz: Int)

  final case class MediaFeatures(media_id: Long, kind: String, n_frames: Int,
                                 n_bytes: Int, features: Array[Float])

  /** What a decoder returns for one payload. */
  final case class Decoded(nFrames: Int, features: Array[Float])

  /** The external-library boundary. Implementations must be
    * serializable (shipped to executors) and cheap to reuse across the
    * rows of a partition. */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, payload: Array[Byte], featureDim: Int): Decoded
  }

  /**
   * Deterministic stand-in for a real decoder: pseudo-features from a
   * rolling hash of the payload, frame count from payload length. A
   * real deployment replaces this object — nothing else changes.
   */
  object StubDecoder extends MediaDecoder {
    override def decode(kind: String, payload: Array[Byte], featureDim: Int): Decoded = {
      val frames = kind match {
        case "image" => 1
        case "audio" => math.max(1, payload.length / 64)
        case "video" => math.max(1, payload.length / 256)
        case _       => 0
      }
      var h = 1125899906842597L // deterministic seed
      val features = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        features(i % featureDim) += (h % 1000) / 1000.0f
        i += 1
      }
      Decoded(frames, features)
    }
  }

  /** Manufacture a media table from the text corpus (UTF-8 payloads) —
    * a stand-in source until real binary columns exist in the fixtures. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Kinds), (col("doc_id") % Kinds.size).cast(IntegerType) + 1)
        .as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate_hz"))

  /**
   * Decode + feature-extract, one decoder per partition. The input is
   * pruned to the columns the decoder needs before the shuffle-free
   * partition pass; output is a narrow typed frame ready for the
   * similarity operators.
   */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder,
                      featureDim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload", "width", "height", "sample_rate_hz")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup happens here (library handle, scratch buffers)
        rows.map { r =>
          val d = decoder.decode(r.kind, r.payload, featureDim)
          MediaFeatures(r.media_id, r.kind, d.nFrames, r.payload.length, d.features)
        }
      }
  }

  /** Frame sampling as pure metadata math (every `stride`-th frame). */
  def sampleFrameCount(features: DataFrame, stride: Int): DataFrame =
    features.withColumn("n_sampled_frames",
      ceil(col("n_frames").cast(DoubleType) / stride).cast(IntegerType))
}
