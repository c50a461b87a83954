package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Relational

/**
 * Streaming U1: MERGE-style upsert as a `foreachBatch` sink over plain
 * parquet (SURVEY S7 streaming note + §7.4.1).
 *
 * Vanilla parquet has no ACID upsert, and a naive
 * read-union-overwrite would delete the files it is still reading. The
 * staged overwrite closes that hole: the merged result is fully
 * written to a staging directory first, then swapped in with two
 * renames. On a real deployment the swap is one metadata commit in a
 * lakehouse table format; the staging pattern keeps the same contract
 * with nothing but a filesystem.
 */
object UpsertSink {

  /** Write `df` to `targetPath` via a staging directory + rename swap.
    * Readers concurrent with the swap see the old or the new snapshot,
    * never a partial one. */
  def stagedOverwrite(df: DataFrame, targetPath: String): Unit = {
    val spark = df.sparkSession
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(targetPath + ".staging")
    val retired = new Path(targetPath + ".retired")
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString) // materializes BEFORE touching target
    fs.delete(retired, true)
    if (fs.exists(target)) fs.rename(target, retired)
    fs.rename(staging, target)
    fs.delete(retired, true)
  }

  /**
   * Partitioned incremental upsert: the store is laid out as
   * `<store>/<key>=<value>/` parquet partitions, and a micro-batch
   * rewrites ONLY the partitions of the keys it carries — every other
   * partition's files are left byte-identical. This is what makes the
   * continuous pipeline incremental at scale: a batch touching 3 of
   * 10 000 symbols does 3 partitions of I/O, not a full-store rewrite.
   *
   * Plan shape: one distinct() on the (tiny) key set, a pruned read of
   * just the touched partition directories, one upsert shuffle, one
   * partitionBy write into a staging dir, then a per-partition rename
   * swap (readers see each partition's old or new snapshot, never a
   * torn one — the same contract as [[stagedOverwrite]], narrowed to
   * the touched keys). Key values must be filesystem-safe (tickers
   * are); a general deployment would escape them.
   *
   * Returns the touched key values (sorted).
   */
  def upsertPartitioned(batch: DataFrame, storePath: String,
                        key: String = "symbol"): Seq[String] = {
    val spark = batch.sparkSession
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the distinct key list is partition metadata, not data — collecting
    // it is how any table format plans a partition-level commit
    val touched = batch.select(key).distinct().collect().map(_.getString(0)).toSeq.sorted
    if (touched.isEmpty) return Nil

    val existingDirs = touched.map(s => new Path(root, s"$key=$s"))
      .filter(fs.exists(_)).map(_.toString)
    val merged =
      if (existingDirs.nonEmpty) {
        val target = spark.read.option("basePath", storePath)
          .schema(batch.schema).parquet(existingDirs: _*)
        Relational.upsert(target, batch, Seq(key))
      } else batch

    val staging = new Path(storePath + ".staging")
    fs.delete(staging, true)
    merged.write.mode("overwrite").partitionBy(key).parquet(staging.toString)
    fs.mkdirs(root)
    touched.foreach { s =>
      val src = new Path(staging, s"$key=$s")
      if (fs.exists(src)) {
        val dst = new Path(root, s"$key=$s")
        // retire-then-swap, never delete-then-rename: rename signals
        // failure by RETURNING FALSE, so an unchecked delete+rename
        // could silently drop the partition's only copy
        val retired = new Path(root, s".$key=$s.retired")
        fs.delete(retired, true)
        if (fs.exists(dst) && !fs.rename(dst, retired))
          sys.error(s"upsertPartitioned: failed to retire $dst")
        if (!fs.rename(src, dst)) {
          if (fs.exists(retired)) fs.rename(retired, dst) // restore, then fail loudly
          sys.error(s"upsertPartitioned: failed to swap in $dst")
        }
        fs.delete(retired, true)
      }
    }
    fs.delete(staging, true)
    touched
  }

  /** Run a streaming frame into a keyed parquet target: each
    * micro-batch upserts on `keys` (batch rows win), via staged
    * overwrite. With `checkpointDir` set, the query survives restarts:
    * a batch written but not offset-committed before a crash is
    * REPLAYED on recovery, and the upsert is idempotent under that
    * replay (same keys → same whole-row replace), so the store
    * converges to the batch-equivalent result — the foreachBatch
    * exactly-once recipe. Returns the started query. */
  def keyedUpsertStream(stream: DataFrame, keys: Seq[String],
                        targetPath: String,
                        checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val fs = new Path(targetPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val merged =
        if (fs.exists(new Path(targetPath))) {
          val target = spark.read.parquet(targetPath)
          Relational.upsert(target, batch, keys)
        } else batch
      stagedOverwrite(merged, targetPath)
    }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
