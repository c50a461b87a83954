package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Typed loaders for the driver-generated star schema (`TESTDATA.md`):
 * TPC-H-ish tables plus an event stream, a text-document table, and an
 * embedding table. Each loader is a plain parquet scan — column pruning
 * and predicate pushdown are left to Catalyst, so callers should
 * select/filter as early as possible and let the optimizer reach the
 * scan.
 */
object Tables {

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /**
   * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which the
   * Spark parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We
   * read nanos as a plain INT64 via the legacy conf and convert to
   * microsecond `TimestampType` ourselves. The conversion uses integer
   * division (`div`), never float division: nanosecond epoch values
   * (~1.7e18) exceed 2^53 and would be silently corrupted by a round
   * trip through Double.
   *
   * The original nanosecond value is preserved as `ts_ns` for callers
   * that need full precision (e.g. deterministic ordering).
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events").selectExpr(
      "event_id",
      "timestamp_micros(ts div 1000) AS ts",
      "ts AS ts_ns",
      "user_id",
      "event_type",
      "value",
      "props"
    )
  }
}
