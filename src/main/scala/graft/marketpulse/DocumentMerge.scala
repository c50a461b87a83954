package graft.marketpulse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Relational

/**
 * The reference's two merge laws (SURVEY §2.10):
 *
 *  - U1, document-level MERGE: one row per symbol survives, the newest
 *    load's document replaces the old wholesale
 *    (`dags/minio_to_snowflake.py:66-75`).
 *  - U2, date-level incremental merge: the union of date keys, with the
 *    NEWER value winning on collision, and `"Meta Data"` replaced
 *    entirely by the newest fetch (`dags/get_stock.py:88-97`). This is
 *    what makes daily full-history refetches idempotent and
 *    append-only.
 *
 * Both are set-oriented: any number of symbols/versions merge in one
 * shuffle on the key — versus the reference's per-symbol loop. At
 * scale, U2's explode keeps rows narrow (symbol, date, one OHLCV
 * struct) through the shuffle; documents are only re-assembled at the
 * end, and only if the caller wants the document shape back.
 */
object DocumentMerge {

  /** U1: upsert `incoming` into `existing` (both rawTable-shaped, one
    * row per symbol per version); newest load_date wins per symbol. */
  def upsertDocuments(existing: DataFrame, incoming: DataFrame): DataFrame =
    Relational.dedupeKeepFirst(
      existing.unionByName(incoming),
      keys = Seq("symbol"),
      order = Seq(col("load_date").desc))

  /**
   * U2: collapse multiple document versions per symbol into one merged
   * document per symbol — union of series dates with last-writer-wins
   * per (symbol, date), metadata from the newest version.
   *
   * Input: rawTable-shaped rows, any number of versions per symbol.
   * Output: rawTable-shaped, exactly one row per symbol; its load_date
   * is the newest version's.
   */
  def mergeIncremental(versions: DataFrame): DataFrame = {
    val seriesCol = col("data").getField(Schemas.SeriesKey)

    // newest version carries Meta Data + load_date (the clobber law,
    // get_stock.py:95)
    val newest = Relational.dedupeKeepFirst(versions, Seq("symbol"),
      Seq(col("load_date").desc))
      .select(col("symbol"),
        col("data").getField(Schemas.MetaKey).as("meta"),
        col("load_date"))

    // explode every version's series; last writer wins per (symbol, date)
    val bars = versions
      .select(col("symbol"), col("load_date").as("v_load"),
        explode(seriesCol).as(Seq("date", "bar")))
    val latestBars = Relational.dedupeKeepFirst(bars,
      keys = Seq("symbol", "date"), order = Seq(col("v_load").desc))

    // deterministic re-assembly: sort entries by date inside each group
    val series = latestBars
      .groupBy(col("symbol"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("date"), col("bar")))))
        .as("series"))

    // left join from newest: a symbol whose every version had an empty
    // series keeps its (empty-map) document rather than vanishing
    newest.join(series, Seq("symbol"), "left")
      .select(
        col("symbol"),
        struct(
          col("meta").as(Schemas.MetaKey),
          coalesce(col("series"), map().cast(Schemas.rawDocument(Schemas.SeriesKey).dataType))
            .as(Schemas.SeriesKey)).as("data"),
        col("load_date"))
  }
}
