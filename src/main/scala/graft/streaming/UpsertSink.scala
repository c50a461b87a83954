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

  /** Run a streaming frame into a keyed parquet target: each
    * micro-batch upserts on `keys` (batch rows win), via staged
    * overwrite. Returns the started query. */
  def keyedUpsertStream(stream: DataFrame, keys: Seq[String],
                        targetPath: String): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val fs = new Path(targetPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val merged =
        if (fs.exists(new Path(targetPath))) {
          val target = spark.read.parquet(targetPath)
          Relational.upsert(target, batch, keys)
        } else batch
      stagedOverwrite(merged, targetPath)
    }.start()
}
