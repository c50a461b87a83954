package graft.marketpulse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * JSON document write-back (S5's second half): the reference
 * pretty-prints each symbol's merged document back to object storage
 * as `alphavantage/{symbol}.json` (`dags/get_stock.py:86,99-104`),
 * making the landed store itself the durable merge state.
 *
 * One row = one document = one file is the contract, so the sink runs
 * `foreachPartition` over the (symbol, pretty-json) projection and
 * writes through the Hadoop FileSystem API: the work distributes with
 * the partitioning (no driver-side loop, no collect), and each file is
 * written atomically via a temp-file + rename so a concurrent
 * `Ingest.readDocuments` never sees a torn document. On a real
 * deployment the same code addresses an object store through its
 * Hadoop connector; the filesystem semantics are identical.
 */
object DocumentSink {

  /** Write each rawTable-shaped row as `<root>/<symbol>.json`
    * (pretty-printed, one object per file — the exact shape
    * [[Ingest.readDocuments]] consumes). */
  def writeDocuments(raw: DataFrame, root: String): Unit = {
    val docs = raw.select(
      col("symbol"),
      to_json(col("data"), Map("pretty" -> "true")).as("doc"))
    // ship the session's Hadoop conf (filesystem credentials, object
    // store endpoints) to the executors — a bare Configuration() would
    // silently drop them outside local mode
    val confThunk = org.apache.spark.util.GraftConfBridge.broadcastConf(
      raw.sparkSession.sparkContext,
      raw.sparkSession.sessionState.newHadoopConf())
    docs.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.hasNext) {
        val conf = confThunk()
        val rootPath = new Path(root)
        // per-partition PRIVATE handle (newInstance, not the JVM-shared
        // cache): setWriteChecksum on the cached instance would disable
        // .crc sidecars for every other writer in this executor
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(rootPath.toUri, conf)
        try {
          fs.setWriteChecksum(false) // no .crc sidecars next to the documents
          fs.mkdirs(rootPath)
          // tmp names carry the task attempt id so a speculative or
          // retried attempt can't publish another attempt's half-written
          // file; the publish itself is a single atomic overwrite-rename
          // (FileContext), so a concurrent reader always sees a complete
          // old or new document — never a missing or torn one
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(rootPath.toUri, conf)
          rows.foreach { r =>
            val symbol = r.getString(0)
            val target = new Path(rootPath, s"$symbol.json")
            val tmp = new Path(rootPath, s".$symbol.json.$attempt.tmp")
            val out = fs.create(tmp, true)
            try out.write(r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
            fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          }
        } finally fs.close()
      }
    }
  }
}
