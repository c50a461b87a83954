package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.quality.SketchBounds
import graft.sources.Tables

/**
 * The sketch accuracy contract behind dq02. Since round 9 dq02 itself
 * emits in-engine bound booleans (the raw HLL/KLL sketch values are
 * engine-specific, so the gated output carries exact columns + bound
 * checks) — this spec re-derives the sketches directly from the events
 * table and asserts the SAME published error bounds against exact
 * answers, independent of dq02's output shape, then asserts dq02's own
 * gated booleans all come back true on the fixture.
 */
class SketchAccuracySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sketches() =
    Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5),
          lit(SketchBounds.PercentileAccuracy)).as("p50_value"),
        percentile_approx(col("value"), lit(0.95),
          lit(SketchBounds.PercentileAccuracy)).as("p95_value"))

  test("HLL approx distinct users is within the advertised relative error") {
    // approx_count_distinct defaults to rsd = 5%; 3σ is the
    // practical hard bound (shared contract: SketchBounds).
    val rows = sketches()
      .select("event_type", "approx_users", "exact_users").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(exact > 0)
      val rel = math.abs(approx - exact) / exact
      info(f"${r.getString(0)}%-12s approx=$approx%.0f exact=$exact%.0f rel=$rel%.4f")
      assert(rel <= SketchBounds.Hll3Rsd,
        f"HLL error $rel%.4f above 3σ bound for ${r.getString(0)}")
    }
  }

  test("approx percentiles land at the right rank of the exact distribution") {
    // percentile_approx(accuracy=1000) guarantees rank error ≤ n/1000;
    // verify the returned values' TRUE ranks sit near the requested
    // quantiles (±2% slack ≫ the guarantee, immune to ties)
    val sketch = sketches()
      .select("event_type", "p50_value", "p95_value").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val events = Tables.events(spark, dir).select("event_type", "value")
      .persist()
    try {
      sketch.foreach { case (et, (p50, p95)) =>
        assert(p50 <= p95, s"$et: p50 > p95")
        // null-safe: dq02 deliberately retains a NULL event_type
        // group; === would match nothing for et == null (n=0, NaN ranks)
        val grp = events.filter(col("event_type") <=> lit(et))
        val n = grp.count().toDouble
        val rank50 = grp.filter(col("value") <= p50).count() / n
        val rank95 = grp.filter(col("value") <= p95).count() / n
        info(f"$et%-12s p50 true-rank=$rank50%.3f  p95 true-rank=$rank95%.3f")
        // slack covers tie mass of 2-decimal values on top of the
        // n/1000 rank guarantee
        assert(rank50 >= 0.45 && rank50 <= 0.55, s"$et: p50 rank $rank50 off")
        assert(rank95 >= 0.92 && rank95 <= 0.98, s"$et: p95 rank $rank95 off")
      }
    } finally { events.unpersist(); () }
  }

  test("dq02's in-engine bound booleans are all true on the fixture") {
    val rows = Registry.byName("dq02_sketch_profile").run(spark, dir)
      .select("event_type", "hll_within_2rsd", "p50_within_rank_err",
        "p95_within_rank_err").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1), s"${r.getString(0)}: hll_within_2rsd false")
      assert(r.getBoolean(2), s"${r.getString(0)}: p50_within_rank_err false")
      assert(r.getBoolean(3), s"${r.getString(0)}: p95_within_rank_err false")
    }
  }
}
