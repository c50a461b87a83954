package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Asserts the sketch queries' self-reported quality booleans are
 * actually TRUE on the driver's gate fixture — not merely
 * engine-agreed. The oracle gate proves Spark and DuckDB compute the
 * SAME `within_3rsd` / `merge_ok`; an accuracy or merge regression
 * that flips the boolean consistently in both engines would still
 * gate green. This spec pins the booleans themselves, and pins the
 * fixture inside the estimator's declared domain
 * ([[graft.quality.Hll.MinCardinalityDomain]]), so either kind of
 * drift is a loud failure.
 */
class SketchFixtureSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def fixtureReady = new java.io.File(dir).isDirectory

  test("dq23: fixture is inside the raw-HLL domain and within_3rsd is true") {
    assume(fixtureReady)
    val rows = Registry.byName("dq23_hll_sketch").run(spark, dir)
      .select("exact_distinct", "within_3rsd").distinct().collect()
    assert(rows.length == 1)
    val exact = rows.head.getLong(0)
    assert(exact >= graft.quality.Hll.MinCardinalityDomain,
      s"fixture cardinality $exact fell below the raw estimator's " +
        s"declared domain floor ${graft.quality.Hll.MinCardinalityDomain}" +
        " — the within_3rsd gate is meaningless there")
    assert(rows.head.getBoolean(1), "HLL estimate missed the 3-rsd bound")
  }

  test("dq24: merge_ok is true and every probe's CMS excess is one-sided") {
    assume(fixtureReady)
    val rows = Registry.byName("dq24_cms_sketch").run(spark, dir)
      .select("merge_ok", "excess").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(0)), "day-shard merge drifted from direct")
    assert(rows.forall(_.getLong(1) >= 0L),
      "CMS underestimated a probe — the one-sided error guarantee broke")
  }

  test("dq26: signature saturates, ranks hit the bound, and the merge held") {
    assume(fixtureReady)
    val rows = Registry.byName("dq26_qsketch").run(spark, dir)
      .select("k_used", "within_bound", "merge_ok").collect()
    assert(rows.length == graft.quality.Qs.Quantiles.length)
    assert(rows.forall(_.getLong(0) == graft.quality.Qs.K.toLong),
      "fixture no longer saturates the sample — the binomial rank " +
        "bound below assumes a full K-row signature")
    assert(rows.forall(_.getBoolean(1)),
      "a sample quantile's exact rank escaped the 3.5-sd bound")
    assert(rows.forall(_.getBoolean(2)),
      "month-shard min-union drifted from the direct global bottom-K")
  }

  test("dq25: saturated signature estimates land within 3 rse of exact") {
    assume(fixtureReady)
    val r = Registry.byName("dq25_kmv_setops").run(spark, dir)
      .select("k_used", "union_est", "inter_est", "exact_union",
        "exact_inter").distinct().collect()
    assert(r.length == 1)
    val (kUsed, unionEst, interEst) =
      (r.head.getLong(0), r.head.getDouble(1), r.head.getDouble(2))
    val (exactUnion, exactInter) = (r.head.getLong(3), r.head.getLong(4))
    assert(kUsed == graft.quality.Kmv.K.toLong,
      "fixture cohorts no longer saturate the signature — " +
        "the rse bound below assumes the saturated estimator")
    // rse ~ 1/sqrt(k-2); 3 rse at k=32 is ~55% — loose, but it turns
    // an estimator regression (e.g. the pre-r16 unsaturated-formula
    // bug applied saturated) into a failure instead of a shrug
    val rse = 1.0 / math.sqrt((graft.quality.Kmv.K - 2).toDouble)
    assert(math.abs(unionEst - exactUnion) <= 3 * rse * exactUnion,
      s"union estimate $unionEst vs exact $exactUnion")
    assert(math.abs(interEst - exactInter) <= 3 * rse * exactUnion,
      s"intersection estimate $interEst vs exact $exactInter")
  }
}
