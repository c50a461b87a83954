package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One engine capability exposed through the driver contract
 * (`SparkEntry.queries` / `SparkEntry.oracleSql`).
 *
 * @param name      stable query id; also the output directory name
 * @param run       DataFrame program over the tables in `sfDir`
 * @param oracle    equivalent ANSI SQL for DuckDB over the same parquet
 *                  tables; None for ops not expressible in portable SQL
 *                  (the driver then records a weaker rows-only check)
 * @param headline  included in the Bench timing set
 * @param oracleGen oracle SQL that can only be rendered with the data
 *                  in hand (e.g. sim05 embeds FITTED centroids as
 *                  literals); evaluated by [[graft.SparkEntry.oracleSql]]
 *                  when [[OracleContext]] is set (graft.Verify sets it),
 *                  else the query degrades to the rows-only check
 */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    oracleGen: Option[(SparkSession, String) => String] = None)

/**
 * Ambient (session, sfDir) for [[GraftQuery.oracleGen]] oracles whose
 * SQL embeds data-fitted literals. The driver contract fixes
 * `SparkEntry.oracleSql` as a zero-argument map, but `graft.Verify` —
 * the only producer of `oracle_sql.json` — always has a session and a
 * scale-factor dir in hand; it publishes them here before dumping.
 */
object OracleContext {
  @volatile var current: Option[(SparkSession, String)] = None
}

/** Shared rendering helpers for [[GraftQuery.oracleGen]] SQL. */
object OracleSql {
  /** A `VALUES`-shaped relation body for driver-derived literals that
    * stays valid SQL when no rows rendered: an empty `VALUES` list is
    * a DuckDB syntax error, which would turn a legitimately-empty
    * result (e.g. every document under 3 tokens) into an oracle
    * failure. `nullTuple` is one all-NULL tuple with the right arity
    * and explicit CASTs so the typed empty relation joins cleanly. */
  def valuesOrEmpty(rows: String, nullTuple: String): String =
    if (rows.isEmpty) s"SELECT * FROM (VALUES $nullTuple) WHERE FALSE"
    else s"VALUES $rows"
}

object Registry {
  /** Full inventory, in SURVEY §2 order: core relational parity, the
    * MarketPulse pipeline re-expressed on the event stream, then the
    * large-scale training-data extensions (text, dedup, similarity). */
  lazy val all: Seq[GraftQuery] =
    CoreQueries.all ++ AdvancedQueries.all ++ GraphTruthQueries.all ++
      DedupTruthQueries.all ++ MarketPulseQueries.all ++
      TextQueries.all ++ SimilarityQueries.all ++
      SimilarityTruthQueries.all ++ StreamingQueries.all ++
      MultimodalQueries.all ++ MultimodalTruthQueries.all ++
      StorageQueries.all ++ QualityQueries.all

  lazy val byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
}
