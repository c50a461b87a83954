package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Exact._
import graft.ops.Relational
import graft.sources.Tables

/**
 * Core relational parity queries over the star schema — one per operator
 * family in SURVEY §2 (aggregation, distinct, broadcast left join,
 * weekly date_trunc rollup, CASE/IN dimension mapping, top-k, anti/semi
 * join, window rank/lag, set ops, NULLIF arithmetic, JSON extraction,
 * MERGE-style keep-latest, streaming-shaped tumbling window, multi-way
 * join, ROLLUP).
 *
 * Determinism rules (shared with the DuckDB oracles):
 *  - monetary aggregation in exact decimal (see [[graft.ops.Exact]]);
 *  - ratios as double division of exact-decimal-derived doubles
 *    (bit-identical on any IEEE engine, no rounding needed);
 *  - every ORDER BY/LIMIT and window ordering is made total with a key
 *    tiebreak.
 */
object CoreQueries {

  // ---- q01: TPC-H Q1-shaped pricing summary (scan + filter + hash agg) ----
  private def q01(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumExact(dec(col("l_quantity"))).as("sum_qty"),
        sumExact(dec(col("l_extendedprice"))).as("sum_base_price"),
        sumExact(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))).as("sum_disc_price"),
        sumExact(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
          * (lit(1) + rate(col("l_tax")))).as("sum_charge"),
        avgExact(col("l_quantity")).as("avg_qty"),
        avgExact(col("l_extendedprice")).as("avg_price"),
        avgExact(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  private val q01Oracle =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---- q02: DISTINCT (grouping-only aggregate) ----
  private def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select("c_mktsegment").distinct()

  private val q02Oracle = "SELECT DISTINCT c_mktsegment FROM customer"

  // ---- q03: fact ⟕ dim enrichment (broadcast left join, SURVEY J1) ----
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_mktsegment")
    o.select("o_orderkey", "o_custkey", "o_totalprice")
      .join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("c_mktsegment"), col("o_totalprice"))
  }

  private val q03Oracle =
    """SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin

  // ---- q04: weekly rollup (date_trunc week = Monday on both engines) ----
  private def q04(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      // dates surface as ISO strings: DATE values reach comparators through
      // different client paths (date32 vs datetime64) — strings are unambiguous
      .groupBy(date_trunc("week", col("o_orderdate")).cast(DateType).cast(StringType)
        .as("week_start"))
      .agg(
        count(lit(1)).as("n_orders"),
        sumExact(dec(col("o_totalprice"))).as("revenue"),
        avgExact(col("o_totalprice")).as("avg_price"))

  private val q04Oracle =
    """SELECT CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS VARCHAR) AS week_start,
      |  COUNT(*) AS n_orders,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
      |FROM orders GROUP BY 1""".stripMargin

  // ---- q05: dimension via CASE / IN-list + small join (SURVEY E7/P4/J1) ----
  private def q05(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(
        col("n_nationkey"), col("n_name"), col("r_name"),
        when(col("n_name").isin("NATION_0", "NATION_5", "NATION_10"), "CORE")
          .when(col("n_name") === "NATION_1", "GROWTH")
          .when(col("r_name") === "ASIA", "ASIA_BLOC")
          .otherwise("Other").as("market"))
  }

  private val q05Oracle =
    """SELECT n.n_nationkey, n.n_name, r.r_name,
      |  CASE WHEN n.n_name IN ('NATION_0','NATION_5','NATION_10') THEN 'CORE'
      |       WHEN n.n_name = 'NATION_1' THEN 'GROWTH'
      |       WHEN r.r_name = 'ASIA' THEN 'ASIA_BLOC'
      |       ELSE 'Other' END AS market
      |FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin

  // ---- q06: top-k with total order (sort + limit) ----
  private def q06(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sumExact(dec(col("o_totalprice"))).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(10)

  private val q06Oracle =
    """SELECT o_custkey,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey
      |ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin

  // ---- q07: anti join (dbt `relationships`-test shape, SURVEY J3) ----
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  private val q07Oracle =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  // ---- q08: semi join (EXISTS) ----
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val li = Tables.lineitem(spark, dir).select(col("l_suppkey"))
    s.join(li, s("s_suppkey") === li("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
  }

  private val q08Oracle =
    """SELECT s_suppkey, s_name, s_acctbal FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin

  // ---- q09: IN-list + range predicate pushdown (SURVEY P3/P4) ----
  private def q09(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_type").isin("PROMO", "ECONOMY") &&
        col("p_size").between(10, 20))
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")

  private val q09Oracle =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
      |WHERE p_type IN ('PROMO','ECONOMY') AND p_size BETWEEN 10 AND 20""".stripMargin

  // ---- q10: window rank top-3 per group ----
  private def q10(spark: SparkSession, dir: String): DataFrame =
    Relational.topKPerGroup(
      Tables.customer(spark, dir).select("c_mktsegment", "c_custkey", "c_acctbal"),
      keys = Seq("c_mktsegment"),
      order = Seq(col("c_acctbal").desc, col("c_custkey")),
      k = 3)

  private val q10Oracle =
    """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) t WHERE rn <= 3""".stripMargin

  // ---- q11: window lag + exact telescoping aggregation ----
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), dec(col("value")).as("v"))
      .withColumn("delta", col("v") - lag(col("v"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sumExact(col("delta")).as("net_change"),
        max(col("v")).cast(DoubleType).as("max_value"),
        min(col("v")).cast(DoubleType).as("min_value"))
  }

  private val q11Oracle =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(ROUND(SUM(delta), 2) AS DOUBLE) AS net_change,
      |  CAST(MAX(v) AS DOUBLE) AS max_value,
      |  CAST(MIN(v) AS DOUBLE) AS min_value
      |FROM (
      |  SELECT user_id, CAST(value AS DECIMAL(12,2)) AS v,
      |    CAST(value AS DECIMAL(12,2)) - LAG(CAST(value AS DECIMAL(12,2)), 1)
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS delta
      |  FROM events) t
      |GROUP BY user_id""".stripMargin

  // ---- q12: set operation (UNION with dedup) ----
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val high = o.filter(col("o_orderpriority") === "2-HIGH").select("o_custkey")
    urgent.union(high).distinct()
  }

  private val q12Oracle =
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'""".stripMargin

  // ---- q13: row-level arithmetic with NULLIF guard (SURVEY E4/E5) ----
  private def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      (dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast(DoubleType).as("net_price"),
      (dec(col("l_extendedprice")).cast(DoubleType) / dec(col("l_quantity")).cast(DoubleType))
        .as("unit_price"),
      (dec(col("l_extendedprice")).cast(DoubleType) /
        nullif(rate(col("l_discount")), lit(0)).cast(DoubleType)).as("price_per_discount"))

  private val q13Oracle =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net_price,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) / CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS unit_price,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) / CAST(NULLIF(CAST(l_discount AS DECIMAL(4,2)), 0) AS DOUBLE) AS price_per_discount
      |FROM lineitem""".stripMargin

  // ---- q14: JSON path extraction + aggregation (SURVEY F2/E10) ----
  private def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))

  private val q14Oracle =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  // ---- q15: MERGE-style keep-latest upsert (SURVEY U1/S7) ----
  private def q15(spark: SparkSession, dir: String): DataFrame =
    Relational.dedupeKeepFirst(
      Tables.events(spark, dir)
        .select("user_id", "event_id", "event_type", "value"),
      keys = Seq("user_id"),
      order = Seq(col("event_id").desc))
      .withColumnRenamed("event_id", "last_event_id")
      .withColumnRenamed("event_type", "last_type")
      .withColumnRenamed("value", "last_value")

  private val q15Oracle =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type, value AS last_value
      |FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin

  // ---- q16: tumbling-window aggregation (batch twin of the streaming path) ----
  private def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sumExact(dec(col("value"))).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  private val q16Oracle =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---- q17: multi-way join with broadcast dims ----
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sumExact(dec(col("o_totalprice"))).as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
  }

  private val q17Oracle =
    """SELECT r.r_name,
      |  CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT c.c_custkey) AS n_customers
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name""".stripMargin

  // ---- q18: ROLLUP hierarchy totals (labels coalesced, so no NULL-group
  //           ambiguity reaches the comparator) ----
  private def q18(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sumExact(dec(col("o_totalprice"))).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))

  private val q18Oracle =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q01_pricing_summary", q01, Some(q01Oracle), headline = true),
    GraftQuery("q02_distinct_segments", q02, Some(q02Oracle)),
    GraftQuery("q03_order_enrich", q03, Some(q03Oracle), headline = true),
    GraftQuery("q04_weekly_revenue", q04, Some(q04Oracle), headline = true),
    GraftQuery("q05_nation_market", q05, Some(q05Oracle)),
    GraftQuery("q06_top_customers", q06, Some(q06Oracle)),
    GraftQuery("q07_customers_no_orders", q07, Some(q07Oracle)),
    GraftQuery("q08_suppliers_with_sales", q08, Some(q08Oracle)),
    GraftQuery("q09_part_filter", q09, Some(q09Oracle)),
    GraftQuery("q10_segment_top3", q10, Some(q10Oracle)),
    GraftQuery("q11_user_value_delta", q11, Some(q11Oracle), headline = true),
    GraftQuery("q12_priority_union", q12, Some(q12Oracle)),
    GraftQuery("q13_line_metrics", q13, Some(q13Oracle)),
    GraftQuery("q14_event_json", q14, Some(q14Oracle), headline = true),
    GraftQuery("q15_latest_events", q15, Some(q15Oracle), headline = true),
    GraftQuery("q16_hourly_event_stats", q16, Some(q16Oracle), headline = true),
    GraftQuery("q17_region_revenue", q17, Some(q17Oracle), headline = true),
    GraftQuery("q18_rollup_orders", q18, Some(q18Oracle)))
}
