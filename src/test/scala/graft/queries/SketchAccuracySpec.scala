package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/**
 * dq02's sketches are rows-only under the driver gate (HLL/KLL layouts
 * are engine-specific by construction) — so their accuracy contract is
 * asserted HERE instead: the sketch answers must sit inside the error
 * bounds the algorithms advertise, measured against exact answers on
 * real data.
 */
class SketchAccuracySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("HLL approx distinct users is within the advertised relative error") {
    // approx_count_distinct defaults to rsd = 5%; 3σ ⇒ 15% is the
    // practical hard bound. dq02 emits approx and exact side by side.
    val rows = Registry.byName("dq02_sketch_profile").run(spark, dir)
      .select("event_type", "approx_users", "exact_users").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(exact > 0)
      val rel = math.abs(approx - exact) / exact
      info(f"${r.getString(0)}%-12s approx=$approx%.0f exact=$exact%.0f rel=$rel%.4f")
      assert(rel <= 0.15, f"HLL error $rel%.4f above 3σ bound for ${r.getString(0)}")
    }
  }

  test("approx percentiles land at the right rank of the exact distribution") {
    // percentile_approx(accuracy=1000) guarantees rank error ≤ n/1000;
    // verify the returned values' TRUE ranks sit near the requested
    // quantiles (±2% slack ≫ the guarantee, immune to ties)
    val sketch = Registry.byName("dq02_sketch_profile").run(spark, dir)
      .select("event_type", "p50_value", "p95_value").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val events = Tables.events(spark, dir).select("event_type", "value")
      .persist()
    try {
      sketch.foreach { case (et, (p50, p95)) =>
        assert(p50 <= p95, s"$et: p50 > p95")
        val grp = events.filter(col("event_type") === et)
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
}
