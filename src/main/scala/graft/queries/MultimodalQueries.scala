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

  // ---- mm03: the decode boundary's METADATA contract under the oracle
  //      gate. Frame counts and byte sizes are deterministic functions
  //      of (kind, payload), so DuckDB recomputes them independently —
  //      the `features` vector stays decoder-specific (mm01/mm02). ----
  private def mm03(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir).toDF()
      .select(col("media_id"), col("kind"), col("n_frames"), col("n_bytes"))

  private val mm03Oracle =
    """SELECT doc_id AS media_id,
      |  ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |  CASE (doc_id % 3) + 1
      |    WHEN 1 THEN 1
      |    WHEN 2 THEN GREATEST(1, strlen(text) // 64)
      |    ELSE GREATEST(1, strlen(text) // 256) END AS n_frames,
      |  strlen(text) AS n_bytes
      |FROM documents""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("mm01_media_features", mm01, None),
    GraftQuery("mm02_media_ann", mm02, None, headline = true),
    GraftQuery("mm03_media_inventory", mm03, Some(mm03Oracle)))
}
