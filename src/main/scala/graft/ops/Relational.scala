package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Reusable relational operators that the reference pipeline needs but
 * Spark does not ship as single calls. All are pure
 * `DataFrame => DataFrame` combinators built from Catalyst-optimizable
 * primitives — no RDDs, no driver-side loops — so they keep whole-stage
 * codegen and scale with partitioning.
 *
 * Reference semantics covered (citations into /root/reference):
 *  - keyed MERGE upsert (`dags/minio_to_snowflake.py:66-75`)
 *  - last-writer-wins incremental document merge (`dags/get_stock.py:88-97`)
 *  - FLATTEN of a JSON map column (`dbt_finance/models/staging/stg_alphavantage.sql:19-20`)
 */
object Relational {

  /**
   * Keep exactly one row per key group: the first row under `order`
   * (ties broken by the order columns supplied — callers must make the
   * ordering total to stay deterministic).
   *
   * This is the engine's MERGE primitive: `upsert` below reduces to it.
   * Cost at scale: one hash shuffle on `keys` + a per-partition sort —
   * no global sort, no driver involvement. For heavily skewed keys,
   * pre-aggregation via AQE skew-split applies because it's a plain
   * window over a hash partitioning.
   */
  def dedupeKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * MERGE-style upsert of `source` into `target` on `keys`: a matched
   * key takes the source row wholesale (whole-row replace, like the
   * reference's `WHEN MATCHED THEN UPDATE` of the entire document);
   * unmatched source rows are inserted; unmatched target rows survive.
   *
   * Implemented as union + keep-newest, so it is set-oriented (one
   * shuffle for any number of upserted keys) rather than the
   * reference's row-at-a-time MERGE loop.
   */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = target.withColumn("__src", lit(0))
      .unionByName(source.withColumn("__src", lit(1)))
    dedupeKeepFirst(tagged, keys, Seq(col("__src").desc)).drop("__src")
  }

  /**
   * FLATTEN a map column into (key, value) rows — inner semantics: an
   * empty/NULL map yields no rows, matching Snowflake FLATTEN's default
   * `OUTER => FALSE`.
   */
  def flattenMap(df: DataFrame, mapCol: Column, keyName: String, valueName: String,
                 keep: Seq[Column]): DataFrame =
    df.select(keep :+ explode(mapCol).as(Seq(keyName, valueName)): _*)

  /**
   * Top-k rows per group under a total order. One shuffle on the group
   * keys; the rank filter is evaluated streaming inside the sorted
   * partition, so memory is O(partition), not O(k·groups) on the
   * driver.
   */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
                   rankName: String = "rn"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankName, row_number().over(w)).filter(col(rankName) <= k)
  }
}
