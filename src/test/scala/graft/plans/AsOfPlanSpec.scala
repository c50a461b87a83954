package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The custom whole-operator path: the GraftAsOfJoin node must plan
  * through AsOfJoinStrategy to EXACTLY the proven composed lowering's
  * results, and its declared output attributes must bind under
  * downstream operators (the exprId-remap contract). */
class AsOfPlanSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def trades = Seq(
    (1L, 10L, 100.0), (1L, 20L, 110.0), (2L, 15L, 50.0), (3L, 5L, 7.0))
    .toDF("k", "t", "px")
  private def quotes = Seq(
    (1L, 5L, 99.0), (1L, 10L, 101.0), (1L, 18L, 109.0), (2L, 30L, 55.0))
    .toDF("k", "qt", "bid")

  test("node ≡ composed lowering, including inclusive match and no-predecessor NULL") {
    val viaNode = AsOf.join(trades, quotes, Seq("k"), "t", "qt", Seq("qt", "bid"))
      .collect().map(_.toSeq).toSet
    val viaCompose = graft.ops.Relational.asOfJoin(
        trades, quotes, Seq("k"), "t", "qt", Seq("qt", "bid"))
      .select("k", "t", "px", "qt", "bid")
      .collect().map(_.toSeq).toSet
    assert(viaNode == viaCompose)
    // spot semantics: inclusive (t=10 takes qt=10), late-only right →
    // NULL (k=2 quote at 30 > trade at 15), no right rows at all (k=3)
    val byKey = viaNode.map(s => (s(0), s(1)) -> s(3)).toMap
    assert(byKey((1L, 10L)) == 10L, "inclusive match at equal order")
    assert(byKey((2L, 15L)) == null, "right row after the left order → NULL")
    assert(byKey((3L, 5L)) == null, "no right rows for the key → NULL")
  }

  test("downstream operators bind against the node's output (filter, project, agg)") {
    val joined = AsOf.join(trades, quotes, Seq("k"), "t", "qt", Seq("bid"))
    val out = joined.filter(col("bid").isNotNull)
      .select(col("k"), (col("px") - col("bid")).as("spread"))
      .groupBy(col("k")).agg(sum(col("spread")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // k=1: (100-101) + (110-109) = 0.0 — both trades matched
    assert(out == Map(1L -> 0.0))
  }

  test("strategy registration is idempotent and the plan carries the lowering") {
    GraftStrategies.register(spark)
    GraftStrategies.register(spark)
    assert(spark.experimental.extraStrategies.count(_ == AsOfJoinStrategy) == 1)
    val p = AsOf.join(trades, quotes, Seq("k"), "t", "qt", Seq("bid"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"lowered plan must carry the window fill:\n$p")
  }

  test("column pruning reaches the parquet scans below the node") {
    // the node's one declarative advantage: Catalyst sees exactly which
    // attributes the operator references, so a query selecting one
    // right-side value column must NOT read the unreferenced right
    // columns from disk (ReadSchema pin, the io17/io18 style) — and the
    // strategy lowers from the OPTIMIZED subtree, so pruning/pushdown
    // run inside the lowering too
    val dir = java.nio.file.Files.createTempDirectory("graft-asof-prune-").toString
    trades.write.mode("overwrite").parquet(s"$dir/l")
    quotes
      .withColumn("r_wide_unused", lit("x"))
      .withColumn("r_wide_unused2", lit(7L))
      .write.mode("overwrite").parquet(s"$dir/r")
    val l = spark.read.parquet(s"$dir/l")
    val r = spark.read.parquet(s"$dir/r")
    val out = AsOf.join(l, r, Seq("k"), "t", "qt", Seq("bid"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("r_wide_unused"),
      s"unreferenced right columns must be pruned below the as-of node:\n$p")
    assert(out.count() == trades.count())
  }

  test("self-join inputs survive re-analysis (r21: shared-lineage exprId trap)") {
    // q50's shape: BOTH sides filter/project the SAME base frame, so an
    // un-aliased passthrough column (k here, user_id there) carries the
    // same exprId on both sides. The node's right-side attributes must
    // not bind ambiguously: before the fresh-alias Project in AsOf.join,
    // the DataFrame constructed fine and .write worked, but ANY action
    // that wraps the plan in a new operator and re-analyzes (.count(),
    // .groupBy()) failed with UNRESOLVED_COLUMN on the left key.
    val base = Seq((1L, "p", 10L, 100.0), (1L, "c", 5L, 99.0),
      (1L, "c", 8L, 101.0), (2L, "p", 15L, 50.0))
      .toDF("k", "side", "t", "v")
    val l = base.filter(col("side") === "p")
      .select(col("k"), col("t"), col("v").as("pv"))
    val r = base.filter(col("side") === "c")
      .select(col("k"), col("t").as("ct"), col("v").as("cv"))
    val j = AsOf.join(l, r, Seq("k"), "t", "ct", Seq("ct", "cv"))
      .select("k", "t", "pv", "ct", "cv")
    assert(j.count() == 2, "re-analysis under count() must bind")
    val rows = j.collect().map(x => (x.getLong(0), x.getLong(1)) ->
      Option(x.get(3))).toMap
    assert(rows((1L, 10L)) == Some(8L), "k=1 purchase takes latest prior click")
    assert(rows((2L, 15L)) == None, "k=2 has no clicks → NULL")
  }

  test("name collisions refuse loudly instead of silently shadowing") {
    intercept[IllegalArgumentException] {
      AsOf.join(trades, quotes.withColumnRenamed("bid", "px"),
        Seq("k"), "t", "qt", Seq("px"))
    }
    intercept[IllegalArgumentException] {
      AsOf.join(trades, quotes, Seq("k"), "t", "missing", Seq("bid"))
    }
    // DUPLICATE names on one side must refuse, not bind the first match
    // — the "unambiguous names" contract, enforced rather than assumed
    intercept[IllegalArgumentException] {
      AsOf.join(trades,
        quotes.select(col("k"), col("qt"), col("qt"), col("bid")),
        Seq("k"), "t", "qt", Seq("bid"))
    }
  }
}
