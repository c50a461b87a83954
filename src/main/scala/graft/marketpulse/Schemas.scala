package graft.marketpulse

import org.apache.spark.sql.types._

/**
 * Explicit schemas for the provider document model (SURVEY §1.1):
 * a per-symbol JSON document whose daily series is a MAP from date
 * string to an OHLCV struct with quoted, digit-prefixed field names,
 * and whose numeric values all arrive as JSON strings (typed late, in
 * staging — mirroring `stg_alphavantage.sql:13-18`).
 *
 * Schemas are always declared, never inferred: at 100 TB a schema
 * inference pass is a full extra scan, and inference would also guess
 * the series as a struct-of-thousands-of-date-fields instead of a map.
 */
object Schemas {

  val SeriesKey = "Time Series (Daily)"
  val MetaKey = "Meta Data"
  val MetaSymbolKey = "2. Symbol"

  /** OHLCV leaf struct — all values strings, names quoted verbatim
    * (`stg_alphavantage.sql:14-18`). */
  val ohlcv: StructType = StructType(
    Seq("1. open", "2. high", "3. low", "4. close", "5. volume")
      .map(StructField(_, StringType)))

  /** Whole raw document (`dags/get_stock.py:94-97`). */
  val rawDocument: StructType = StructType(Seq(
    StructField(MetaKey, MapType(StringType, StringType)),
    StructField(SeriesKey, MapType(StringType, ohlcv))))

  /** Raw landing table (`dags/minio_to_snowflake.py:42-48`):
    * one row per symbol, whole document in a semi-structured column,
    * load timestamp defaulted at load time. */
  val rawTable: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("data", rawDocument),
    StructField("load_date", TimestampType)))

  /** Canonical→provider symbol aliases (`dags/get_stock.py:30-32`);
    * storage always keys by the canonical form. */
  val symbolAliases: Map[String, String] = Map("BRK.B" -> "BRK-B")

  /** Provider→canonical (inverse alias lookup for incoming ids). */
  val canonicalSymbols: Map[String, String] = symbolAliases.map(_.swap)
}
