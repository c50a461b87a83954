package graft.marketpulse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Exact._
import graft.sources.Tables

/**
 * The reference pipeline's dbt model DAG (staging → dim/fact → weekly
 * aggregate; `/root/reference/dbt_finance/models`) re-expressed over the
 * driver's `events` table, treating the event stream as tick data:
 * (event_type, day) plays (symbol, trading_date) and per-day OHLCV bars
 * are derived with order-statistics aggregates.
 *
 * Mirrors the reference's semantics operator-for-operator:
 *  - dim via DISTINCT + CASE with deliberate dead/missing branches
 *    (`dim_stock.sql:10-29`; quirk SURVEY §2.13.1 — a mapped value that
 *    never occurs, an occurring value that falls to the 'Unknown'
 *    fallback);
 *  - fact via broadcast LEFT JOIN + derived change metrics with a
 *    NULLIF(open, 0) divide-by-zero guard (`fact_stock_prices.sql:20-24`);
 *  - weekly aggregate via DATE_TRUNC('week') → Monday on both Spark and
 *    Snowflake (`agg_weekly_prices.sql:3-9`).
 *
 * All plans are single-shuffle per aggregation, broadcast for the ≤5-row
 * dim — the same shapes survive a 1000-executor scale-up.
 */
object EventTicker {

  /** Daily OHLCV bars per event type. open/close are value-at-first/last
    * event_id (arg-min/arg-max — deterministic because event_id is
    * unique), high/low are plain min/max. One hash aggregation. */
  def dailyBars(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // day as ISO string: DATE values reach comparators through different
      // client paths (date32 vs datetime64) — strings are unambiguous, and
      // ISO strings order identically to the dates they name
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).cast(StringType).as("day"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).as("volume"))

  /** Event-type dimension: DISTINCT + CASE mapping. 'refund' is a dead
    * branch (never occurs); 'error' has no branch and falls through to
    * the 'Unknown Event'/'Other' fallback — reproducing the reference's
    * NFLX/V quirk exactly. */
  def dim(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("event_type")).distinct()
      .select(
        col("event_type"),
        when(col("event_type") === "purchase", "Purchase Checkout")
          .when(col("event_type") === "click", "Click")
          .when(col("event_type") === "view", "Page View")
          .when(col("event_type") === "signup", "Signup")
          .when(col("event_type") === "refund", "Refund")
          .otherwise("Unknown Event").as("display_name"),
        when(col("event_type").isin("purchase", "refund"), "commerce")
          .when(col("event_type").isin("click", "view"), "engagement")
          .otherwise("Other").as("category"))

  /** Fact: bars enriched via broadcast left join + derived metrics.
    * Change metrics are plain double arithmetic — per-row IEEE ops are
    * bit-deterministic; only aggregation needs the decimal path. */
  def fact(spark: SparkSession, dir: String): DataFrame = {
    val bars = dailyBars(spark, dir)
    val d = dim(spark, dir)
    bars.join(broadcast(d), Seq("event_type"), "left")
      .select(
        col("event_type"), col("display_name"), col("category"),
        col("day"), col("open"), col("high"), col("low"), col("close"),
        col("volume"),
        (col("close") - col("open")).as("daily_change"),
        ((col("close") - col("open")) / nullif(col("open"), lit(0)) * lit(100.0))
          .as("percent_change"))
  }

  /** Weekly aggregate: exact-decimal average close plus a telescoped
    * week-over-week percent change (open at first day, close at last). */
  def weekly(spark: SparkSession, dir: String): DataFrame =
    dailyBars(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("week", to_date(col("day"))).cast(DateType).cast(StringType)
          .as("week_start"))
      .agg(
        count(lit(1)).as("n_days"),
        avgExact(col("close")).as("avg_close"),
        sum(col("volume")).as("volume"),
        min_by(col("open"), col("day")).as("week_open"),
        max_by(col("close"), col("day")).as("week_close"))
      .withColumn("weekly_pct",
        (col("week_close") - col("week_open")) / nullif(col("week_open"), lit(0)) * lit(100.0))
}
