package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Plan-shape assertions: the scale properties the engine claims
  * (pushdown, broadcast, exchange-free bucketed joins) hold in the
  * actual physical plans, not just in scaladoc. */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.byName(name).run(spark, dir).queryExecution.executedPlan.toString

  test("q01: shipdate predicate and column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_comment")) // never read
  }

  test("q03: dimension side is broadcast, no shuffle join") {
    val p = plan("q03_order_enrich")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("bucketed join plans without any exchange") {
    val joined = StorageQueries.bucketedJoin(spark, dir)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("Exchange"), s"expected exchange-free co-located join:\n$p")
    assert(p.contains("SelectedBucketsCount"))
  }

  test("every registry query name is unique and oracle column aliases are sane") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    // every oracle must be non-empty SQL mentioning a known table
    val tables = Seq("lineitem", "orders", "customer", "supplier", "part",
      "nation", "region", "events", "documents", "embeddings")
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (n, sql) =>
      assert(tables.exists(sql.contains), s"$n oracle references no known table")
    }
  }
}
