package graft.marketpulse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Staging model (`stg_alphavantage.sql:1-23`): FLATTEN the daily-series
 * map into one row per (symbol, trading_date) and apply the late typed
 * casts. Inner explode semantics — an empty or missing series yields no
 * rows, matching Snowflake FLATTEN's default OUTER => FALSE
 * (`stg_alphavantage.sql:19-20`).
 *
 * Types follow SURVEY §1.2: FLOAT→Double (Snowflake FLOAT is double
 * precision), INT→Long (38-digit Snowflake INT; volumes overflow Int in
 * principle), `key::date` → to_date on the ISO map key.
 */
object Staging {

  /** rawTable-shaped input → flat typed staging table. */
  def stgAlphavantage(raw: DataFrame): DataFrame = {
    def v(field: String) = col("bar").getField(field)
    raw
      .select(col("symbol"),
        explode(col("data").getField(Schemas.SeriesKey)).as(Seq("date", "bar")))
      .select(
        col("symbol"),
        to_date(col("date")).as("trading_date"),
        v("1. open").cast(DoubleType).as("open"),
        v("2. high").cast(DoubleType).as("high"),
        v("3. low").cast(DoubleType).as("low"),
        v("4. close").cast(DoubleType).as("close"),
        v("5. volume").cast(LongType).as("volume"))
  }
}
