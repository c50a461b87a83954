package graft.marketpulse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Document ingestion (SURVEY S1–S6): parse provider JSON documents into
 * the raw landing shape — one row per symbol, whole document in a
 * typed semi-structured column, load timestamp attached.
 *
 * The reference fetches over HTTP one symbol at a time
 * (`dags/get_stock.py:53-71`) and lands one JSON object per symbol in
 * object storage; here the fetch is out of scope (an external,
 * rate-limited boundary) and ingestion starts from the landed
 * documents: a directory of JSON files or an in-memory collection of
 * document strings. Both paths produce identical schemas.
 */
object Ingest {

  /** Documents rejected when the daily-series key is absent —
    * the reference's validity check (`dags/get_stock.py:64-68`). */
  private def valid(df: DataFrame): DataFrame =
    df.filter(col("data").getField(Schemas.SeriesKey).isNotNull)

  private def withSymbolAndLoadDate(parsed: DataFrame, loadDate: Column): DataFrame = {
    // merge key = document's own metadata symbol (minio_to_snowflake.py:62),
    // mapped back through the provider-alias table to its canonical form
    val metaSymbol = col("data").getField(Schemas.MetaKey).getItem(Schemas.MetaSymbolKey)
    val canonical = Schemas.canonicalSymbols.foldLeft(metaSymbol) {
      case (expr, (provider, canon)) => when(metaSymbol === provider, canon).otherwise(expr)
    }
    valid(parsed.withColumn("__load_date", loadDate)).select(
      canonical.as("symbol"),
      col("data"),
      col("__load_date").as("load_date"))
      // a document without a metadata symbol has no storage/merge key —
      // malformed by the reference's contract (minio_to_snowflake.py:62
      // keys every row by it); dropped like the series-less case
      .filter(col("symbol").isNotNull)
  }

  /** Read landed documents from a directory of whole-file JSON docs
    * (schema-on-read with a declared schema; a missing/empty path is the
    * caller's concern). `multiLine` because each file is one pretty-printed
    * object, not JSON-lines. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    withSymbolAndLoadDate(
      spark.read.option("multiLine", true).schema(Schemas.rawDocument).json(path)
        .select(struct(col(s"`${Schemas.MetaKey}`"), col(s"`${Schemas.SeriesKey}`")).as("data")),
      current_timestamp())

  /** Parse a frame holding raw document strings in `jsonCol` into the
    * rawTable shape. `loadDate` may reference other columns of `docs`
    * (e.g. a per-version fetch timestamp) — this is the shared seam for
    * the batch, streaming, and test ingest paths. */
  def parseDocumentFrame(docs: DataFrame, jsonCol: Column,
                         loadDate: Column = current_timestamp()): DataFrame =
    withSymbolAndLoadDate(
      docs.withColumn("data", from_json(jsonCol, Schemas.rawDocument)), loadDate)

  /** Parse documents already in memory (tests, streaming payloads). */
  def parseDocuments(spark: SparkSession, docs: Seq[String]): DataFrame = {
    import spark.implicits._
    parseDocumentFrame(docs.toDF("json"), col("json"))
  }
}
