package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic 10× blow-up of the text/similarity corpora for the
 * third bench scaling point (sf0.01 → sf0.1 → 10×sf0.1).
 *
 * Built to scale HONESTLY, not degenerately: naive row duplication
 * would plant 10 exact/near duplicates of every document and 10
 * colinear copies of every vector, turning the dedup and near-dup
 * queries quadratic BY CONSTRUCTION (10× data → 45× pairs) — a
 * benchmark of the fixture, not the engine. Instead:
 *
 *  - documents: copy k ≥ 1 suffixes every token with `#k`, so shingle
 *    sets across copies are disjoint (no cross-copy near-dups) while
 *    each copy group keeps the fixture's internal planted-dup
 *    structure — pair counts scale exactly linearly;
 *  - embeddings: copy k ≥ 1 adds a small deterministic per-(copy,
 *    dimension) jitter, decorrelating the copies so LSH buckets and
 *    IVF cells deepen ~10× (what real 10× data does) instead of
 *    collapsing onto identical signatures.
 *
 * Copy 0 is the untouched base corpus. The blow-up writes once per
 * machine (marker file) and is reused across bench runs.
 */
object BenchData {

  def ensureBlowUp(spark: SparkSession, srcDir: String, factor: Int): String = {
    val dst = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft-blowup-${factor}x")
    val marker = new java.io.File(dst, "_BLOWUP_COMPLETE")
    if (!marker.exists()) {
      dst.mkdirs()
      writeDocuments(spark, srcDir, dst.toString, factor)
      writeEmbeddings(spark, srcDir, dst.toString, factor)
      marker.createNewFile()
    }
    dst.toString
  }

  private def writeDocuments(spark: SparkSession, src: String, dst: String,
                             factor: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val n = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val copies: Seq[DataFrame] = (0 until factor).map { k =>
      val text =
        if (k == 0) col("text")
        else concat_ws(" ",
          transform(split(col("text"), " "), t => concat(t, lit(s"#$k"))))
      docs.select(
        (col("doc_id") + lit(k * n)).as("doc_id"),
        text.as("text"),
        col("lang"),
        col("source"),
        length(text).cast("long").as("n_chars"))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
  }

  private def writeEmbeddings(spark: SparkSession, src: String, dst: String,
                              factor: Int): Unit = {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val n = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val copies: Seq[DataFrame] = (0 until factor).map { k =>
      val vec =
        if (k == 0) col("embedding")
        else transform(col("embedding"),
          // ±0.03 deterministic per-(copy, slot) jitter — enough to
          // decorrelate signatures, small enough to keep the corpus
          // geometry (unclustered, max cos ~0.46) representative
          (x, j) => x + ((lit(k * 31) + j) % 7 - lit(3)).cast("float") * lit(0.01f))
      emb.select(
        (col("vec_id") + lit(k * n)).as("vec_id"),
        vec.as("embedding"),
        col("label"))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }
}
