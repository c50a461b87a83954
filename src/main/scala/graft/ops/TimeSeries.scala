package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Calendar-regularization operators: a sparse per-key observation
 * series densified onto a gap-free date spine with forward-filled
 * gauges — the resample/ffill step every daily-bar or monitoring
 * pipeline runs before window math (a RANGE frame tolerates gaps, but
 * ratio-to-yesterday, ffilled prices, and chart feeds do not).
 *
 * Scale shape: gap-fill operates on the AGGREGATED daily grain — rows
 * per key are bounded by the calendar span, not the fact-table row
 * count — so the per-key window here is bounded work per key by
 * construction. The raw-event aggregation that produces the input is
 * the caller's (shuffling) step; nothing here re-touches fact rows.
 */
object TimeSeries {

  /**
   * Densify `observed` (one row per key × date, dates possibly gappy)
   * onto each key's full [min, max] calendar at day grain:
   *
   *  - every missing date gains a row;
   *  - `ffillCols` carry the latest preceding observed value forward
   *    (`last(ignoreNulls)` over the per-key date order — never NULL
   *    past the first observation, which exists by construction since
   *    the spine starts at the key's own min);
   *  - `zeroFillCols` fill with 0 (additive gauges: counts, volume);
   *  - `is_observed` marks spine rows that had a real observation.
   *
   * The spine is built distributed — per-key (min, max) aggregate, then
   * a map-side `sequence` explode — so no driver-side calendar and no
   * cross-key skew: each key explodes to its own span only.
   */
  def gapFill(observed: DataFrame, keys: Seq[String], dateCol: String,
              ffillCols: Seq[String], zeroFillCols: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val spine = observed.groupBy(keyCols: _*)
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
      .select(keyCols :+ explode(
        sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as(dateCol): _*)
    val joined = spine.join(
      observed.withColumn("__obs", lit(true)), keys :+ dateCol, "left")
    val w = Window.partitionBy(keyCols: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = ffillCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val zeroed = zeroFillCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0L)))
    }
    zeroed.withColumn("is_observed", coalesce(col("__obs"), lit(false)))
      .drop("__obs")
  }
}
