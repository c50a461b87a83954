package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.sources.Tables

/**
 * Multimodal pipeline queries (rows-only: the decode stage is a stubbed
 * external-library boundary, not expressible in SQL). Media payloads
 * are manufactured from the text corpus; the Spark-side plumbing —
 * binary columns, partition-wise decode, feature vectors feeding the
 * similarity operators — is the real path.
 */
object MultimodalQueries {

  private def features(spark: SparkSession, dir: String) =
    Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(Tables.documents(spark, dir)),
      Multimodal.StubDecoder)

  // ---- mm01: decode + per-kind feature statistics ----
  private def mm01(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_frames")).as("total_frames"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(Similarity.l2Norm(Similarity.toDoubleVec(col("features")))), 4)
          .as("avg_feature_norm"))

  // ---- mm02: similarity search over decoded features ----
  private def mm02(spark: SparkSession, dir: String): DataFrame = {
    val feats = features(spark, dir).toDF()
      .select(col("media_id").as("id"), col("features").as("vec"))
    Similarity.bruteForceTopK(feats, feats.filter(col("id") < 5), k = 3)
      .select("query_id", "cand_id", "cosine", "rank")
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("mm01_media_features", mm01, None),
    GraftQuery("mm02_media_ann", mm02, None, headline = true))
}
