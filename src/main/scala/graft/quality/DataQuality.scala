package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's declarative data-quality surface (SURVEY §5): dbt
 * schema tests compiled to must-return-zero-rows queries
 * (`staging/schema.yml:15-27`, `marts/schema.yml:3-50`), plus the
 * corrected composite-uniqueness check the reference should have had
 * (§2.13.2 — `unique` on trading_date alone is unsound at >1 symbol).
 *
 * Each check counts violations with one aggregation — no collect of
 * offending rows to the driver; callers wanting examples can re-run the
 * predicate as a filter.
 */
object DataQuality {

  final case class CheckResult(check: String, table: String, column: String,
                               violations: Long) {
    def passed: Boolean = violations == 0L
  }

  def notNull(df: DataFrame, table: String, column: String): CheckResult =
    CheckResult("not_null", table, column,
      df.filter(col(column).isNull).count())

  def unique(df: DataFrame, table: String, column: String): CheckResult =
    CheckResult("unique", table, column,
      df.groupBy(col(column)).count().filter(col("count") > 1).count())

  def compositeUnique(df: DataFrame, table: String, columns: Seq[String]): CheckResult =
    CheckResult("composite_unique", table, columns.mkString("+"),
      df.groupBy(columns.map(col): _*).count().filter(col("count") > 1).count())

  /** dbt `relationships`: every child key must exist in the parent —
    * the anti-join must be empty (`marts/schema.yml:22-24`). */
  def foreignKey(child: DataFrame, childCol: String,
                 parent: DataFrame, parentCol: String,
                 table: String): CheckResult = {
    val orphans = child.select(col(childCol)).filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol)),
        child(childCol) === parent(parentCol), "left_anti")
    CheckResult("relationships", table, childCol, orphans.count())
  }

  // ---- Lazy single-row report variants: each check as an aggregation
  //      DataFrame, unioned into one report — nothing collects to the
  //      driver, so a report over N checks is one job with N scans
  //      (or fewer once the cache/scan-reuse kicks in). ----

  def notNullDf(df: DataFrame, table: String, column: String): DataFrame =
    df.agg(count(when(col(column).isNull, 1)).as("violations"))
      .select(lit("not_null").as("check_name"), lit(table).as("tbl"),
        lit(column).as("col"), col("violations"))

  def uniqueDf(df: DataFrame, table: String, columns: Seq[String]): DataFrame =
    df.groupBy(columns.map(col): _*).count().filter(col("count") > 1)
      .agg(count(lit(1)).as("violations"))
      .select(lit("unique").as("check_name"), lit(table).as("tbl"),
        lit(columns.mkString("+")).as("col"), col("violations"))

  def foreignKeyDf(child: DataFrame, childCol: String,
                   parent: DataFrame, parentCol: String,
                   table: String): DataFrame =
    child.select(col(childCol)).filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol)), child(childCol) === parent(parentCol),
        "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("relationships").as("check_name"), lit(table).as("tbl"),
        lit(childCol).as("col"), col("violations"))

  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)

  /** The reference's 8 declared tests over the four models, plus the
    * corrected composite check. Faithful per-column `unique` on
    * stg.trading_date is included and EXPECTED to fail on multi-symbol
    * data — callers treat it as a characterization, not a gate. */
  def referenceSuite(stg: DataFrame, dim: DataFrame, fact: DataFrame,
                     weekly: DataFrame): Seq[CheckResult] = Seq(
    notNull(stg, "stg_alphavantage", "symbol"),
    notNull(stg, "stg_alphavantage", "trading_date"),
    unique(stg, "stg_alphavantage", "trading_date"), // unsound quirk, §2.13.2
    compositeUnique(stg, "stg_alphavantage", Seq("symbol", "trading_date")),
    unique(dim, "dim_stock", "symbol"),
    notNull(dim, "dim_stock", "symbol"),
    notNull(fact, "fact_stock_prices", "symbol"),
    foreignKey(fact, "symbol", dim, "symbol", "fact_stock_prices"),
    notNull(fact, "fact_stock_prices", "trading_date"),
    notNull(weekly, "agg_weekly_prices", "symbol"),
    notNull(weekly, "agg_weekly_prices", "week_start"))
}
