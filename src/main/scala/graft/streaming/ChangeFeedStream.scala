package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.sources.Tables

/**
 * st17: CDC change-feed apply as a real streaming query — the
 * production mode of io15's operator, where the feed ARRIVES in
 * micro-batches and in no particular order relative to its sequence
 * numbers.
 *
 * The stream maintains only the per-key LATEST change (key, op, seq,
 * payload) — a keep-max-seq merge per batch, which is associative and
 * commutative over batch boundaries, so the maintained state equals
 * the latest-per-key of the whole feed REGARDLESS of how files split
 * into batches or in what order they arrive. Tombstones (op = D) stay
 * in the state — that is what stops a late lower-seq U from
 * resurrecting a deleted key, the classic out-of-order CDC bug. The
 * final table is one [[Relational.applyChangeFeed]] of the state
 * against the base — the batch operator, unchanged — so stream ≡ batch
 * by construction and st17 carries io15's oracle verbatim.
 *
 * State size is bounded by distinct CHANGED keys (a delta, not the
 * base); the base table joins once, at read time, and never enters the
 * streaming loop.
 */
object ChangeFeedStream {

  def cdcApplyReplay(spark: SparkSession, dir: String): DataFrame = {
    val feed = graft.queries.StorageQueries.cdcFeed(spark, dir)
    val feedDir = java.nio.file.Files.createTempDirectory("graft-st17-feed-").toString
    // several files + maxFilesPerTrigger=1 forces true multi-batch
    // arrival; hash-spraying by key decorrelates file order from seq
    // order, so batches genuinely arrive out of sequence
    feed.repartition(4, col("o_orderkey")).write.mode("overwrite").parquet(feedDir)
    val schema = spark.read.parquet(feedDir).schema

    var state: DataFrame = null
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latestB = Relational.dedupeKeepFirst(
          batch, Seq("o_orderkey"), Seq(col("seq").desc))
        val merged =
          if (state == null) latestB
          else Relational.dedupeKeepFirst(
            state.unionByName(latestB), Seq("o_orderkey"), Seq(col("seq").desc))
        // localCheckpoint cuts the per-batch lineage so state stays a
        // materialized delta-sized frame, not a growing plan
        state = merged.localCheckpoint(true)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val out = graft.queries.StorageQueries.cdcProject(
      Relational.applyChangeFeed(Tables.orders(spark, dir), state, "o_orderkey"))
    out.cache().count()
    out
  }
}
