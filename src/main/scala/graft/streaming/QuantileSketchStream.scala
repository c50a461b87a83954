package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.quality.Qs

/**
 * st33: streaming quantile sketch — dq26's per-shard bottom-K
 * signatures maintained as CUSTOM streaming state, the stateful
 * family member whose state a built-in aggregate cannot express
 * (bottom-K is not a fixed-key MIN; it is an order statistic of the
 * whole key stream).
 *
 * The state per shard is the K=256 smallest (h, k, v) triples seen so
 * far. Folding a micro-batch is min-union — `(state ∪ batch) sorted,
 * take K` — which is associative and commutative, so ANY split of the
 * feed into micro-batches, in any arrival order, drains to the exact
 * batch signature ([[graft.quality.Qs]]'s merge law, the one QsSpec
 * pins and dq26's gate proves shard-wise). State is K-bounded per
 * shard — 256 triples regardless of how many rows the shard has
 * absorbed, the whole point of sketch state at 100 TB: the quantile
 * monitor's memory never grows with the stream's past.
 *
 * The report is the SHARED dq26 view over the drained signatures
 * ([[graft.queries.QualityQueries.qsReportFromSignatures]]), so
 * `merge_ok` — which dq26 uses to prove the shard merge identity —
 * here proves drained-stream-state ≡ direct batch bottom-K, cell for
 * cell, and dq26's oracle carries verbatim.
 */
object QuantileSketchStream {

  case class QsRow(shard: String, k: Long, h: Long, v: Double)

  /** Per-shard signature state: the bottom-K (h, k, v) triples in
    * (h, k) order, plus a monotonic update counter so update-mode
    * sinks can recover "latest state per shard" unambiguously (the
    * [[DocumentMergeStream.MergedDoc]] pattern). */
  case class QsSig(shard: String, hs: Seq[Long], ks: Seq[Long],
                   vs: Seq[Double], updates: Long)

  private def fold(shard: String, prev: Option[QsSig],
                   batch: Iterator[QsRow]): QsSig = {
    val old = prev.map(s => s.hs.lazyZip(s.ks).lazyZip(s.vs).toSeq)
      .getOrElse(Seq.empty)
    val all = (old ++ batch.map(r => (r.h, r.k, r.v)))
      .sortBy { case (h, k, _) => (h, k) }.take(Qs.K)
    QsSig(shard, all.map(_._1), all.map(_._2), all.map(_._3),
      prev.map(_.updates + 1).getOrElse(0L))
  }

  /** Stateful bottom-K maintainer over a stream of sketch rows; emits
    * the up-to-date signature for every shard touched by the batch. */
  def sketchStream(rows: Dataset[QsRow]): Dataset[QsSig] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.shard)
      .mapGroupsWithState[QsSig, QsSig](GroupStateTimeout.NoTimeout) {
        (shard, batch, state: GroupState[QsSig]) =>
          val sig = fold(shard, state.getOption, batch)
          state.update(sig)
          sig
      }
  }

  /** Drained update-mode signatures (latest per shard) back to
    * (shard, k, h, v) rows — the `perShard` frame dq26's report
    * consumes. */
  def signatureRows(drained: DataFrame): DataFrame =
    drained
      .select(col("shard"),
        explode(arrays_zip(col("hs"), col("ks"), col("vs"))).as("z"))
      .select(col("shard"), col("z.ks").as("k"), col("z.hs").as("h"),
        col("z.vs").as("v"))

  /** st33's gated entry: spray the order rows into several key-hashed
    * files, replay one file per micro-batch (so every shard's
    * signature is genuinely folded across batches), drain the state,
    * and run the shared dq26 report against the batch fixture.
    * Scratch dirs are deleted once the result is materialized. */
  private val replayCache = new graft.util.PlanCache(maxEntries = 1)

  def quantileSketchReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = graft.queries.QualityQueries.qsRows(
      graft.sources.Tables.orders(spark, dir))
    val tmp = java.nio.file.Files.createTempDirectory("graft-st33-")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    // the whole body under try/finally: a throw from the streaming
    // query, the drain, or the report must not leak the scratch tree
    // under java.io.tmpdir (materialization happens before the finally
    // runs, so the success path is unchanged)
    try {
      val feedDir = s"$tmp/feed"
      rows.repartition(4, col("k")).write.mode("overwrite").parquet(feedDir)
      val schema = spark.read.parquet(feedDir).schema

      val name = "graft_stream_qsketch"
      spark.catalog.dropTempView(name)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(feedDir)
      val q = sketchStream(stream.as[QsRow]).toDF()
        .writeStream.outputMode(OutputMode.Update).format("memory").queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()

      // the memory sink appends one row per (shard, trigger); keep the
      // latest update per shard, then localCheckpoint (eager) — the
      // report joins frames derived from the drained state (st10 lesson)
      val drained = graft.ops.Relational.dedupeKeepFirst(
        spark.table(name), Seq("shard"), Seq(col("updates").desc))
        .localCheckpoint()
      // persisted through the shared PlanCache lifecycle (not a bare
      // .cache()) so Caches.releaseAll() reclaims it between bench
      // tier queries like every other operator-level persist
      val out = replayCache.persisted(
        graft.queries.QualityQueries.qsReportFromSignatures(
          spark, signatureRows(drained), rows))
      out.count() // materialize before the scratch tree goes away
      out
    } finally rm(tmp.toFile)
  }
}
