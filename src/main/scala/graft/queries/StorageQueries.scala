package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Storage-layout queries (SURVEY S5/S6/S8 + §4): a partitioned parquet
 * sink, read back through partition pruning, proving the write →
 * discover → prune → read path end-to-end. The reference's analogue is
 * the per-symbol object layout (`alphavantage/{symbol}.json`) — here
 * the partition column is the storage key, and a filtered read only
 * lists matching directories.
 */
object StorageQueries {

  // ---- io01: partitionBy sink + pruned scan + E11 key formatting ----
  private def io01(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-io01-").toString
    Tables.documents(spark, dir)
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    spark.read.parquet(tmp)
      .filter(col("lang").isin("en", "de")) // prunes to two partition dirs
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .withColumn("storage_key", concat(lit("docs/"), col("lang")))
  }

  private val io01Oracle =
    """SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
      |  concat('docs/', lang) AS storage_key
      |FROM documents WHERE lang IN ('en','de') GROUP BY lang""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("io01_partitioned_sink", io01, Some(io01Oracle)))
}
