package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Physical-layout maintenance for parquet stores.
 *
 * At 100 TB the scan killer is rarely the data, it's the files: a
 * store written by a many-task job at low per-task volume leaves
 * thousands of KB-sized parquet files whose open/footer/seek costs
 * dominate every later read, and whose listing crushes the driver.
 * Periodic compaction — rewrite into files of a target size — is
 * standard table maintenance (what Delta/Iceberg expose as OPTIMIZE /
 * rewrite_data_files), and it must NOT shuffle: it is an I/O rewrite,
 * so the plan is scan → coalesce → write, with the output file count
 * derived from the store's ACTUAL on-disk bytes (row counts don't
 * measure bytes — compression ratio varies per column and encoding).
 */
object Storage {

  /** Total bytes and file count of the data files under `dir`
    * (recursive), ignoring `_SUCCESS`/metadata sidecars and CRCs. */
  def dataFiles(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        bytes += f.getLen; n += 1
      }
    }
    (bytes, n)
  }

  /** Rewrite the parquet store at `src` into `dst` binned to
    * ~`targetBytes` per file, and return the compacted store's frame.
    *
    * `coalesce`, not `repartition`: compaction reduces file count, and
    * coalesce merges read-splits without an exchange — rewriting a
    * store must cost one read + one write, never a shuffle of the
    * whole store. (`repartition` only in the degenerate splitting
    * direction, when the reader produced fewer splits than the target
    * count asks for — e.g. one oversized file being broken up.)
    *
    * For a PARTITIONED store, pass its partition columns: the rewrite
    * then re-emits `partitionBy` so the directory layout — and every
    * downstream partition-pruned scan — survives compaction. (A bare
    * flat rewrite would fold `lang=en/` into a data column and destroy
    * the pruning the layout existed for.) Note coalesce bins by read
    * split, not by partition value, so a task may carry several
    * partitions' rows; the writer splits them back out per directory —
    * file counts then bound at bins × partitions-per-bin, the standard
    * OPTIMIZE trade. */
  def compact(spark: SparkSession, src: String, dst: String,
              targetBytes: Long,
              partitionBy: Seq[String] = Nil): DataFrame = {
    val (bytes, _) = dataFiles(spark, src)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(src)
    val splits = df.rdd.getNumPartitions
    val binned = if (splits >= nFiles) df.coalesce(nFiles)
                 else df.repartition(nFiles)
    binned.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(dst)
    spark.read.parquet(dst)
  }
}
