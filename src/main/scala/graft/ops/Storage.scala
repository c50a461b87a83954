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

  // the boundary plan reads the key-grain counts twice (cumulative +
  // total); persist so planning pays ONE scan of the counts shuffle
  private val layoutCache = new graft.util.PlanCache(maxEntries = 2)

  /**
   * Deterministic balanced range-layout boundaries from EXACT
   * percentiles: the `buckets − 1` cut keys such that bucket i holds
   * the rows with key in [b_i, b_{i+1}) and each bucket covers
   * ~1/buckets of the rows. This is what `repartitionByRange` does
   * NOT give you: Spark's range partitioner SAMPLES, so its
   * boundaries drift run-to-run and under skew — a production layout
   * job plans boundaries from exact quantiles so the physical layout
   * is reproducible (two writers of the same snapshot produce the
   * same files) and balanced by construction. The machinery is the
   * dq07/dq15 exact-percentile recipe: key-grain counts → distributed
   * prefix sum ([[Relational.groupedRunningTotals]] — no one-task
   * global window) → ceil-rank boundary pick; the returned plan is
   * `buckets − 1` longs — metadata, the only thing that ever reaches
   * the driver.
   */
  def rangeBoundaries(keyed: DataFrame, keyCol: String, buckets: Int): Seq[Long] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val counts = layoutCache.persisted(
      keyed.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt")))
    val cums = Relational.groupedRunningTotals(
      counts.withColumn("__g", lit(1)), Seq("__g"), Seq(col(keyCol)),
      Seq(col("cnt") -> "cum"))
    val total = counts.agg(sum(col("cnt")).as("__n"))
    val aggs = (1 until buckets).map { i =>
      min(when(col("cum") >=
        ceil(lit(i) * col("__n").cast(DoubleType) / lit(buckets.toDouble))
          .cast(LongType),
        col(keyCol))).as(s"b$i")
    }
    val row = cums.crossJoin(broadcast(total))
      .agg(aggs.head, aggs.tail: _*).collect()(0)
    (1 until buckets).map { i =>
      // a NULL cell means the min/when aggregate matched no key — fewer
      // distinct keys than buckets (or empty input). getAs[Long] would
      // silently unbox it to 0 and hand back a corrupt boundary plan.
      val cell = row.getAs[Any](s"b$i")
      require(cell != null,
        s"rangeBoundaries: boundary $i of $buckets is undefined — " +
          s"input has fewer distinct '$keyCol' keys than buckets (or is empty)")
      cell.asInstanceOf[Long]
    }
  }

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

  /**
   * Bit-interleaved (Morton / Z-order) key of two non-negative 32-bit
   * dimensions — the multi-column clustering key table formats expose
   * as ZORDER BY. A store sorted on ONE column skips perfectly on that
   * column and not at all on any other; sorting on the interleaved key
   * gives each file a compact axis-aligned box in BOTH dimensions, so
   * 2-D range queries prune files on either (or both) predicates.
   * Built from the classic mask-spread — five shift/and rounds per
   * dimension, all codegen'd builtin expressions, no UDF.
   */
  def interleaveBits(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    def spread(x: Column): Column = {
      // spread the low 32 bits so input bit i lands at output bit 2i
      val m = Seq(
        0x0000FFFF0000FFFFL -> 16, 0x00FF00FF00FF00FFL -> 8,
        0x0F0F0F0F0F0F0F0FL -> 4, 0x3333333333333333L -> 2,
        0x5555555555555555L -> 1)
      m.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
        case (v, (mask, s)) =>
          v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(mask))
      }
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /**
   * 2-D clustered store + manifest: write `df` range-partitioned and
   * sorted on the interleaved key of (`colA`, `colB`), so each output
   * file covers a compact box in both dimensions, and derive the
   * manifest — (file, min/max of BOTH columns, rows) — in one pass.
   * [[sortedStoreWithManifest]]'s zone-map pattern, generalized to the
   * second dimension a single-column sort cannot serve.
   */
  def clusteredStoreWithManifest(df: DataFrame, colA: String, colB: String,
                                 dst: String, nFiles: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val z = interleaveBits(col(colA), col(colB))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dst)
    df.sparkSession.read.parquet(dst)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"),
        count(lit(1)).as("n_rows"))
  }

  /** The files a 2-D box query must read, per a
    * [[clusteredStoreWithManifest]] manifest — every file whose box
    * overlaps BOTH ranges (superset guarantee; the exact predicate
    * still applies after the skip). */
  def pruneFiles2D(manifest: DataFrame, loA: Long, hiA: Long,
                   loB: Long, hiB: Long): Seq[String] = {
    import org.apache.spark.sql.functions._
    manifest.filter(
        col("max_a") >= loA && col("min_a") <= hiA &&
        col("max_b") >= loB && col("min_b") <= hiB)
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

  /**
   * Merge-on-read DELETE application — the lakehouse delete model
   * (Iceberg v2 / Delta deletion vectors) where deletes land as small
   * sidecar frames and the base files are never rewritten:
   *
   *  - POSITION deletes name exact rows as `(file, pos)` — the shape a
   *    row-level DELETE compiles to when the writer knows where each
   *    victim row physically lives;
   *  - EQUALITY deletes name rows by VALUE on `eqKeys` — the shape a
   *    late-arriving retraction takes when the writer knows only the
   *    key, not the location.
   *
   * Read-time semantics: base minus both sets, applied as two
   * LEFT ANTI joins with the delete frames BROADCAST — deletes are
   * delta-sized by the model's premise (a day of deletes against years
   * of data), so a 100 TB base is scanned once and never shuffled,
   * repartitioned, or sorted to learn which of its rows are dead.
   * Compaction ([[compact]]) is what eventually folds the deletes in
   * and empties the sidecars; until then every reader applies them.
   *
   * `base` must carry `fileCol`/`posCol` (the physical address columns
   * a real table format exposes as metadata columns); `posDeletes`
   * carries exactly those two, `eqDeletes` exactly `eqKeys`.
   */
  def applyDeletes(base: DataFrame, posDeletes: DataFrame,
                   eqDeletes: DataFrame, eqKeys: Seq[String],
                   fileCol: String = "file_id",
                   posCol: String = "pos"): DataFrame =
    base
      .join(org.apache.spark.sql.functions.broadcast(posDeletes),
        Seq(fileCol, posCol), "left_anti")
      .join(org.apache.spark.sql.functions.broadcast(eqDeletes),
        eqKeys, "left_anti")

  /**
   * Write-audit-publish (WAP) — the staged-commit discipline that
   * keeps a bad batch out of every reader's view: the frame lands in
   * an UNPUBLISHED generation directory, the audits run against the
   * STAGED FILES (what readers would actually see — not the in-memory
   * plan, so a lossy write would fail its own audit), and only if
   * every audit passes does the `_PUBLISHED` pointer swing to the new
   * generation via an ATOMIC same-filesystem rename. A refused batch
   * leaves its staging directory for inspection and the pointer — and
   * therefore every concurrent reader — exactly where it was. Readers
   * never list generations; they read one pointer file, so publish is
   * all-or-nothing at any table size (the pointer is metadata, the
   * data never moves).
   *
   * Returns (published?, per-audit outcomes).
   */
  def writeAuditPublish(df: DataFrame, root: String, gen: Long,
      audits: Seq[(String, DataFrame => Boolean)]): (Boolean, Seq[(String, Boolean)]) = {
    val spark = df.sparkSession
    new java.io.File(root).mkdirs()
    val stage = s"$root/gen-$gen"
    df.write.mode("overwrite").parquet(stage)
    val staged = spark.read.parquet(stage)
    val report = audits.map { case (name, check) => name -> check(staged) }
    if (report.forall(_._2)) {
      // per-generation audit marker, written only on a passing audit
      // report and BEFORE the pointer swings: rollback keys on it, so a
      // staged-but-REFUSED generation (whose dir deliberately stays on
      // disk for inspection) can never be published after the fact —
      // the WAP invariant is that _PUBLISHED only ever names audited
      // generations, including via the recovery path.
      java.nio.file.Files.write(
        java.nio.file.Paths.get(stage, "_AUDITED"),
        report.map { case (n, _) => n }.mkString("\n").getBytes("UTF-8"))
      val tmp = java.nio.file.Paths.get(root, s"_PUBLISHED.tmp-$gen")
      java.nio.file.Files.write(tmp, s"gen-$gen".getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(root, "_PUBLISHED"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      (true, report)
    } else (false, report)
  }

  /**
   * Roll the `_PUBLISHED` pointer back to an earlier generation — the
   * recovery half of write-audit-publish: when a published snapshot
   * turns out semantically bad (passed its audits, failed in
   * consumption — the bad-backfill case no staged audit can always
   * catch), readers move back to the last good generation by ONE
   * atomic pointer move, because publish never deletes prior
   * generation dirs (that is snapshot-expiry's job, io12). Refuses
   * loudly if the target generation's data is gone — and refuses a
   * generation that was STAGED but never passed its audits (refused
   * batches leave their staging dir on disk for inspection; the
   * `_AUDITED` marker, written only on a passing report, is what
   * separates them from rollback-eligible history — without it a
   * rollback would atomically publish data that never passed audit).
   */
  def rollback(root: String, gen: Long): Unit = {
    val target = java.nio.file.Paths.get(root, s"gen-$gen")
    require(java.nio.file.Files.isDirectory(target),
      s"cannot roll back: generation dir $target does not exist")
    require(java.nio.file.Files.exists(target.resolve("_AUDITED")),
      s"cannot roll back: generation $gen was staged but never passed " +
        "its audits (no _AUDITED marker) — publishing it would violate " +
        "the write-audit-publish invariant")
    val tmp = java.nio.file.Paths.get(root, s"_PUBLISHED.tmp-rb-$gen")
    java.nio.file.Files.write(tmp, s"gen-$gen".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(root, "_PUBLISHED"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The generation the `_PUBLISHED` pointer names, or None before the
    * first successful publish. */
  def readPublished(spark: SparkSession, root: String): Option[DataFrame] = {
    val ptr = java.nio.file.Paths.get(root, "_PUBLISHED")
    if (!java.nio.file.Files.exists(ptr)) None
    else Some(spark.read.parquet(
      s"$root/${new String(java.nio.file.Files.readAllBytes(ptr), "UTF-8")}"))
  }
}
