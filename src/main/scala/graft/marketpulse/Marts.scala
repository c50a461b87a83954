package graft.marketpulse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Mart models — semantics preserved quirk-for-quirk (SURVEY §2.13):
 *
 *  - `dimStock` (`dim_stock.sql:1-30`): DISTINCT symbols + CASE maps.
 *    NFLX keeps its dead branch (mapped but never fetched); V, which IS
 *    fetched, has no branch and lands as 'Unknown Company'/'Other'.
 *  - `factStockPrices` (`fact_stock_prices.sql:10-24`): broadcast LEFT
 *    JOIN to the ≤10-row dim; daily_change and percent_change ROUNDed
 *    to 2 dp at the row level; NULLIF(open, 0) guard makes
 *    percent_change NULL on zero-open days.
 *  - `aggWeeklyPrices` (`agg_weekly_prices.sql:3-9`): Monday-truncated
 *    week; AVG of the already-2dp-rounded percent_change (quantization
 *    before aggregation is part of the reference surface, §2.13.5);
 *    AVG skips NULLs on both engines.
 */
object Marts {

  private[graft] val companies = Seq(
    "AAPL" -> "Apple Inc.",
    "MSFT" -> "Microsoft Corporation",
    "GOOGL" -> "Alphabet Inc.",
    "AMZN" -> "Amazon.com, Inc.",
    "META" -> "Meta Platforms, Inc.",
    "NVDA" -> "NVIDIA Corporation",
    "TSLA" -> "Tesla, Inc.",
    "NFLX" -> "Netflix, Inc.",
    "BRK.B" -> "Berkshire Hathaway Inc.",
    "JPM" -> "JPMorgan Chase & Co.")

  private[graft] val techSymbols = Seq("AAPL", "MSFT", "GOOGL", "META", "NVDA", "TSLA", "NFLX")
  private[graft] val finSymbols = Seq("BRK.B", "JPM")

  def dimStock(staging: DataFrame): DataFrame = {
    val companyCase = companies
      .foldLeft(when(lit(false), lit(null))) { case (acc, (sym, name)) =>
        acc.when(col("symbol") === sym, name)
      }
      .otherwise("Unknown Company")
    staging.select(col("symbol")).distinct()
      .select(
        col("symbol"),
        companyCase.as("company_name"),
        when(col("symbol").isin(techSymbols: _*), "Technology")
          .when(col("symbol").isin(finSymbols: _*), "Financials")
          .when(col("symbol") === "AMZN", "Consumer Discretionary")
          .otherwise("Other").as("sector"))
  }

  def factStockPrices(staging: DataFrame, dim: DataFrame): DataFrame =
    staging.join(broadcast(dim), Seq("symbol"), "left")
      .select(
        col("symbol"), col("company_name"), col("sector"),
        col("trading_date"), col("open"), col("high"), col("low"),
        col("close"), col("volume"),
        round(col("close") - col("open"), 2).as("daily_change"),
        round((col("close") - col("open")) / nullif(col("open"), lit(0)) * 100, 2)
          .as("percent_change"))

  def aggWeeklyPrices(fact: DataFrame): DataFrame =
    fact
      .groupBy(col("symbol"),
        date_trunc("week", col("trading_date")).cast(DateType).as("week_start"))
      .agg(
        avg(col("close")).as("avg_close"),
        avg(col("percent_change")).as("avg_percent_change"))
}
