package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "short"),
    (2L, (1 to 100).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")

  test("media table: binary payloads with kind assignment and metadata") {
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload", "width", "height", "sample_rate_hz"))
    val kinds = media.select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(0L -> "image", 1L -> "audio", 2L -> "video"))
    val payload = media.filter(col("media_id") === 0L)
      .select("payload").collect().head.getAs[Array[Byte]](0)
    assert(new String(payload, "UTF-8") == "alpha beta gamma delta")
  }

  test("stub decode is deterministic and kind-aware") {
    val media = Multimodal.mediaFromDocuments(docs)
    val a = Multimodal.extractFeatures(media, Multimodal.StubDecoder).collect()
      .sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media, Multimodal.StubDecoder).collect()
      .sortBy(_.media_id)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a(0).n_frames == 1)                    // image: single frame
    assert(a(2).n_frames == a(2).n_bytes / 256)   // video: frame per 256 bytes
    assert(a.forall(_.features.length == 16))
  }

  test("decoder is pluggable: a custom decoder flows through the same pipeline") {
    val constant = new Multimodal.MediaDecoder {
      override def decode(kind: String, payload: Array[Byte], dim: Int) =
        Multimodal.Decoded(7, Array.fill(dim)(1.0f))
    }
    val out = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(docs), constant, featureDim = 4).collect()
    assert(out.forall(_.n_frames == 7))
    assert(out.forall(_.features.toSeq == Seq(1.0f, 1.0f, 1.0f, 1.0f)))
  }
}
