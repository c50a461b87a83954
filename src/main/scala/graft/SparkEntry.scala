package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real inventory lives in [[graft.queries.Registry]]; this object
  * only adapts it to the driver's shape. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q01_pricing_summary").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Data-dependent oracles (fitted-literal SQL, e.g. sim05's centroids)
    * render only when [[graft.queries.OracleContext]] carries a session
    * — Verify sets it; without it they stay rows-only. */
  def oracleSql: Map[String, String] = oracleSqlFor(Set.empty)

  /** [[oracleSql]] restricted to `names` (empty = all) BEFORE any
    * rendering happens: data-dependent generators pay corpus-sized
    * collects at the blow-up tiers, so a name-restricted Verify must
    * not render oracles it will never dump. */
  def oracleSqlFor(names: Set[String]): Map[String, String] =
    Registry.all
      .filter(q => names.isEmpty || names(q.name))
      .flatMap { q =>
        q.oracle
          .orElse(for {
            (s, d) <- graft.queries.OracleContext.current
            gen <- q.oracleGen
          } yield gen(s, d))
          .map(q.name -> _)
      }.toMap
}
