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

  /**
   * Range-sorted store + manifest: write `df` range-partitioned and
   * sorted on `keyCol` (each output file then covers a disjoint key
   * range), and derive the manifest — (file, min_key, max_key, rows)
   * — in ONE pass over the store via `input_file_name`. This is
   * file-level data skipping on plain parquet, the pattern table
   * formats ship as manifests/zone-maps: a key-range query prunes the
   * manifest first (metadata, thousands of rows) and reads only the
   * surviving files, instead of opening every footer of a 100 TB
   * store. Row-group pruning inside Spark's scan is invisible to the
   * plan; the file list handed to the reader is not — which makes
   * this variant testable end-to-end.
   */
  def sortedStoreWithManifest(df: org.apache.spark.sql.DataFrame,
                              keyCol: String, dst: String,
                              nFiles: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(dst)
    df.sparkSession.read.parquet(dst)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        count(lit(1)).as("n_rows"))
  }

  /** The files a [lo, hi] key-range query must read, per `manifest` —
    * every file whose [min_key, max_key] overlaps the range. */
  def pruneFiles(manifest: DataFrame, lo: Long, hi: Long): Seq[String] = {
    import org.apache.spark.sql.functions._
    manifest.filter(col("max_key") >= lo && col("min_key") <= hi)
      .select("file").collect().map(_.getString(0)).toSeq
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
