package graft.queries

import graft.marketpulse.{AvRoundTrip, EventTicker, Marts}

/**
 * Oracle-backed checks for the MarketPulse pipeline analogue
 * ([[graft.marketpulse.EventTicker]]). The shared `bars` CTE mirrors
 * `EventTicker.dailyBars` (arg_min/arg_max ≡ min_by/max_by on the unique
 * event_id).
 */
object MarketPulseQueries {

  private[queries] val barsCte =
    """bars AS (
      |  SELECT event_type, CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
      |    arg_min(value, event_id) AS open,
      |    MAX(value) AS high,
      |    MIN(value) AS low,
      |    arg_max(value, event_id) AS close,
      |    COUNT(*) AS volume
      |  FROM events GROUP BY 1, 2)""".stripMargin

  private val dimCte =
    """dim AS (
      |  SELECT event_type,
      |    CASE event_type WHEN 'purchase' THEN 'Purchase Checkout'
      |                    WHEN 'click' THEN 'Click'
      |                    WHEN 'view' THEN 'Page View'
      |                    WHEN 'signup' THEN 'Signup'
      |                    WHEN 'refund' THEN 'Refund'
      |                    ELSE 'Unknown Event' END AS display_name,
      |    CASE WHEN event_type IN ('purchase','refund') THEN 'commerce'
      |         WHEN event_type IN ('click','view') THEN 'engagement'
      |         ELSE 'Other' END AS category
      |  FROM (SELECT DISTINCT event_type FROM events) t)""".stripMargin

  private val mp01Oracle = s"WITH $barsCte SELECT * FROM bars"

  private val mp02Oracle = s"WITH $dimCte SELECT * FROM dim"

  private val mp03Oracle =
    s"""WITH $barsCte, $dimCte
       |SELECT b.event_type, d.display_name, d.category, b.day,
       |  b.open, b.high, b.low, b.close, b.volume,
       |  b.close - b.open AS daily_change,
       |  (b.close - b.open) / NULLIF(b.open, 0) * 100.0 AS percent_change
       |FROM bars b LEFT JOIN dim d ON b.event_type = d.event_type""".stripMargin

  private val mp04Oracle =
    s"""WITH $barsCte
       |SELECT event_type, CAST(CAST(date_trunc('week', CAST(day AS DATE)) AS DATE) AS VARCHAR) AS week_start,
       |  COUNT(*) AS n_days,
       |  CAST(ROUND(SUM(CAST(close AS DECIMAL(12,2))), 2) AS DOUBLE) / COUNT(close) AS avg_close,
       |  CAST(SUM(volume) AS BIGINT) AS volume,
       |  arg_min(open, day) AS week_open,
       |  arg_max(close, day) AS week_close,
       |  (arg_max(close, day) - arg_min(open, day)) / NULLIF(arg_min(open, day), 0) * 100.0 AS weekly_pct
       |FROM bars GROUP BY 1, 2""".stripMargin

  // ---- mp05: the REAL document pipeline (map-shaped provider JSON →
  //      parse → U2 merge → staging flatten → dim enrichment) under the
  //      oracle gate. The overlapping-fetch construction makes the
  //      merged result equal complete daily bars, so the oracle is the
  //      relational computation — fully independent of the JSON path
  //      ([[graft.marketpulse.AvRoundTrip]]). ----
  private val mp05Oracle: String = {
    val companyCase = Marts.companies
      .map { case (sym, name) => s"WHEN '$sym' THEN '$name'" }
      .mkString("CASE symbol ", " ", " ELSE 'Unknown Company' END")
    val techIn = Marts.techSymbols.map(s => s"'$s'").mkString(", ")
    val finIn = Marts.finSymbols.map(s => s"'$s'").mkString(", ")
    s"""WITH bars AS (
       |  SELECT CASE event_type WHEN 'purchase' THEN 'BRK.B' ELSE UPPER(event_type) END AS symbol,
       |    CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS trading_date,
       |    arg_min(value, event_id) AS open,
       |    MAX(value) AS high,
       |    MIN(value) AS low,
       |    arg_max(value, event_id) AS close,
       |    COUNT(*) AS volume
       |  FROM events GROUP BY 1, 2),
       |meta AS (SELECT symbol, MAX(trading_date) AS last_refreshed FROM bars GROUP BY 1),
       |dim AS (
       |  SELECT symbol, $companyCase AS company_name,
       |    CASE WHEN symbol IN ($techIn) THEN 'Technology'
       |         WHEN symbol IN ($finIn) THEN 'Financials'
       |         WHEN symbol = 'AMZN' THEN 'Consumer Discretionary'
       |         ELSE 'Other' END AS sector
       |  FROM (SELECT DISTINCT symbol FROM bars) t)
       |SELECT b.symbol, d.company_name, d.sector, b.trading_date,
       |  b.open, b.high, b.low, b.close, b.volume,
       |  ROUND(b.close - b.open, 2) AS daily_change,
       |  (b.close - b.open) / NULLIF(b.open, 0) * 100.0 AS percent_change,
       |  m.last_refreshed
       |FROM bars b
       |LEFT JOIN dim d ON b.symbol = d.symbol
       |JOIN meta m ON b.symbol = m.symbol""".stripMargin
  }

  // ---- mp06: daily returns + drawdown per ticker — the quant layer
  //      the reference's bar marts feed downstream: previous-close
  //      return via lag() and running-peak drawdown via a cumulative
  //      max, both windowed per symbol OVER THE BAR FRAME — day grain,
  //      so each partition is days-per-symbol (plan-bounded), never a
  //      window over raw events. Bars come from the SAME shared
  //      dailyBars operator mp01 gates; day is an ISO string, whose
  //      lexicographic window order equals chronological. All return
  //      math is a fixed double expression over gated bar cells (the
  //      first day's return is NULL in both engines by lag semantics).
  //      ----
  private def mp06(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    EventTicker.dailyBars(spark, dir)
      .select(col("event_type"), col("day"), col("close"))
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .withColumn("daily_return",
        (col("close") - col("prev_close")) / col("prev_close"))
      .withColumn("peak",
        max(col("close")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("drawdown", (col("close") - col("peak")) / col("peak"))
  }

  private val mp06Oracle =
    s"""WITH $barsCte
       |SELECT event_type, day, close,
       |  LAG(close) OVER (PARTITION BY event_type ORDER BY day) AS prev_close,
       |  (close - LAG(close) OVER (PARTITION BY event_type ORDER BY day))
       |    / LAG(close) OVER (PARTITION BY event_type ORDER BY day)
       |    AS daily_return,
       |  MAX(close) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS UNBOUNDED PRECEDING) AS peak,
       |  (close - MAX(close) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS UNBOUNDED PRECEDING))
       |    / MAX(close) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS UNBOUNDED PRECEDING) AS drawdown
       |FROM bars""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("mp01_daily_bars", EventTicker.dailyBars, Some(mp01Oracle), headline = true),
    GraftQuery("mp02_dim_event", EventTicker.dim, Some(mp02Oracle)),
    GraftQuery("mp03_fact_bars", EventTicker.fact, Some(mp03Oracle), headline = true),
    GraftQuery("mp04_weekly_bars", EventTicker.weekly, Some(mp04Oracle), headline = true),
    GraftQuery("mp05_av_documents", AvRoundTrip.query, Some(mp05Oracle), headline = true),
    GraftQuery("mp06_returns", mp06, Some(mp06Oracle)))
}
