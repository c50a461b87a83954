package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Pins the from-spec [[ReferenceHashes]] implementation to Spark's
 * builtin xxhash64 and to the native SimHash expression. The point of
 * the reimplementation is INDEPENDENCE (the tx07/tx09/tx16 oracles
 * must not derive their fingerprint literals from the expressions
 * under test); the point of this spec is to prove the independent
 * code computes the same function. Lengths cover every code path:
 * empty input, the 1/4/8-byte tails, the 4-lane stripe boundary at
 * 32, and multi-stripe inputs with every tail combination.
 */
class ReferenceHashesSpec extends AnyFunSuite with SparkSpec {

  test("from-spec XXH64 equals Spark's builtin xxhash64 on adversarial lengths") {
    val rnd = new scala.util.Random(7)
    // ASCII-only so string byte length == char count is irrelevant;
    // plus multi-byte UTF-8 samples to pin the byte-level contract
    val cases =
      (0 to 70).map(n => rnd.alphanumeric.take(n).mkString) ++
        Seq("", " ", "\u00e9", "\u65e5\u672c\u8a9e\u30c6\u30ad\u30b9\u30c8", "a" * 31, "b" * 32, "c" * 33,
          "mix\u00e9 \u65e5\u672c ascii", "\u0000\u0001\u0002")
    import spark.implicits._
    val got = cases.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    for (s <- cases) {
      val ours = ReferenceHashes.xxh64(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        ReferenceHashes.SparkSeed)
      assert(ours === got(s), s"xxh64 mismatch for input '$s'")
    }
  }

  test("reference MinHash band keys equal the pipeline's banded frame on the fixture") {
    import graft.dedup.Dedup
    val banded = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("id"),
        Dedup.shingleSet(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Dedup.minHashSignature(col("sh"), 16))
      .select(col("id"), explode(Dedup.bandKeys(col("sig"), 4, 4)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.band_hash"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(banded.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).collect()
    var covered = 0
    for (r <- texts; keys <- ReferenceHashes.minhashBandKeys(r.getString(1));
         (band, key) <- keys) {
      assert(banded((r.getLong(0), band)) === key,
        s"band key mismatch for doc ${r.getLong(0)} band $band")
      covered += 1
    }
    assert(covered === banded.size,
      "reference derivation must cover exactly the pipeline's banded rows")
  }

  test("reference simhash64 equals the native SimHash expression on the fixture") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"),
        graft.dedup.Dedup.simHash64(col("text")).as("sh"))
      .collect()
    assert(docs.nonEmpty)
    for (r <- docs)
      assert(ReferenceHashes.simhash64(r.getString(1)) === r.getLong(2),
        s"simhash mismatch for doc ${r.getLong(0)}")
  }

  test("formula features equal real render+decode, bit for bit, all 3 kinds") {
    // the independence pin behind mm02/mm07's r16 oracles: the
    // formula-side feature vectors (no media library) must equal what
    // the operator computes by rendering real PNG/WAV bytes and
    // decoding them with real codecs — equivalent, yet independently
    // coded, like every other pair in this file
    import graft.multimodal.Multimodal
    for (id <- 0L until 60L) {
      (id % 3) match {
        case 0L =>
          val (w, h) = (8 + (id % 9).toInt, 8 + (id % 7).toInt)
          val decoded = Multimodal.ImageIoDecoder
            .decode("image", Multimodal.renderPng(id, w, h), 16).features
          assert(decoded.sameElements(
            ReferenceHashes.pngFormulaFeatures(id, w, h, 16)),
            s"image feature drift at id $id")
        case 1L =>
          val decoded = Multimodal.ImageIoDecoder.decode("audio",
            Multimodal.renderWav(id, Multimodal.wavSampleCount(id), 16000),
            16).features
          assert(decoded.sameElements(
            ReferenceHashes.wavFormulaFeatures(id, 16000, 16)),
            s"audio feature drift at id $id")
        case _ =>
          val payload = s"some fixture text for row $id".getBytes("UTF-8")
          val decoded = Multimodal.ImageIoDecoder
            .decode("video", payload, 16).features
          assert(decoded.sameElements(
            ReferenceHashes.rollingHashFeatures(payload, 16)),
            s"degraded-path feature drift at id $id")
      }
    }
  }
}
