package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * PLANTED-TRUTH gates for the iterative graph family — the deep-tier
 * answer to a structural problem with organic graph oracles: closing
 * triangles, peeling cores, or propagating component labels in DuckDB
 * costs a recursive/self-join replay that grows super-linearly with
 * the fixture (q45's wedge join measured 47 s at sf0.1; tx20's
 * closure CTE never finished at 5k docs), so the organic gates
 * thinned out above sf0.1 no matter how fast the ENGINE side was.
 *
 * These queries instead run the REAL operators
 * ([[graft.dedup.Dedup.connectedComponents]],
 * [[graft.graph.Triangles.perNodeCounts]],
 * [[graft.graph.KCore.kCore]]) over a graph CONSTRUCTED from gadgets
 * with analytically-known census — cliques, stars, rings, paths,
 * pendant cascades — sized from the fixture's `lineitem` row count so
 * the graph grows with every blow-up tier. The oracle re-derives the
 * expected census by pure integer ARITHMETIC over the generator's id
 * layout (one `generate_series` per gadget family, no joins, no
 * recursion), so the gate costs O(output) at every tier: the 10×/100×
 * fixtures get cell-exact graph evidence with no recursive-CTE oracle
 * at all, and tx20's former circularity objection (a cheap closure
 * oracle would need the engine's own pairs) does not arise — the
 * pairs here are constructed, and pair DISCOVERY stays gated by the
 * banded-LSH gates (tx06 and the skew tiers).
 *
 * The organic-graph gates (q45/q47/tx20 at their measured-affordable
 * tiers) remain: they prove the operators against textbook SQL on
 * real data; these prove them at DEPTH against constructed truth.
 *
 * Generator invariants the oracles depend on (shared Spark/SQL):
 * every gadget family lives in a disjoint contiguous id range with a
 * fixed stride, so node-id sums per gadget are closed-form; all edges
 * are emitted canonically (a < b, distinct, no self-loops).
 */
object GraphTruthQueries {

  private val gtCache = new graft.util.PlanCache(maxEntries = 2)

  /** Gadget-count scale knob: fixture rows / 100, floored at 1 — the
    * 1-row lineitem COUNT is the only data the generator reads, so
    * each blow-up tier grows the planted graph by its own factor. */
  private def scaleOf(spark: SparkSession, dir: String): Long =
    math.max(Tables.lineitem(spark, dir).count() / 100L, 1L)

  // ---- q58: connected components over planted components — K mixed
  //      gadgets (even id → path, odd id → star; sizes 2..9) plus
  //      LONG 64-node chains (the pointer-jumping stress: without
  //      path compression a 64-deep chain costs 64 label rounds; with
  //      it, ~6). Truth per component: min label = the gadget's base
  //      id, size and id-sum closed-form. Any wrong merge, dropped
  //      edge, or unconverged label changes (cluster, n_nodes,
  //      sum_ids) somewhere — the census is a checksum of the WHOLE
  //      labeling, not a top-k sample. ----
  private def q58(spark: SparkSession, dir: String): DataFrame = {
    val g = scaleOf(spark, dir)
    val chains = math.max(g / 64L, 1L)
    val grp = spark.range(g).select(col("id").as("g"),
      (lit(2) + pmod(col("id"), lit(8))).as("s"), (col("id") * 10).as("base"))
    val gadget = grp
      .select(col("g"), col("base"),
        explode(sequence(lit(1L), col("s") - 1)).as("i"))
      .select(
        when(pmod(col("g"), lit(2)) === 0, col("base") + col("i") - 1)
          .otherwise(col("base")).as("a"),
        (col("base") + col("i")).as("b"))
    val chain = spark.range(chains)
      .select((lit(g * 10L) + col("id") * 64L).as("base"),
        explode(sequence(lit(1L), lit(63L))).as("i"))
      .select((col("base") + col("i") - 1).as("a"), (col("base") + col("i")).as("b"))
    graft.dedup.Dedup.connectedComponents(gadget.unionByName(chain), "a", "b")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("id")).as("sum_ids"))
  }

  private val q58Oracle =
    """WITH n AS (SELECT COUNT(*) AS n FROM lineitem),
      |p AS (SELECT GREATEST(n // 100, 1) AS g FROM n),
      |grp AS (SELECT unnest(generate_series(0, g - 1)) AS gi, g FROM p),
      |comp AS (SELECT gi * 10 AS cluster, 2 + (gi % 8) AS sz FROM grp),
      |ch AS (SELECT unnest(generate_series(0, GREATEST(g // 64, 1) - 1)) AS ci, g
      |       FROM p)
      |SELECT CAST(cluster AS BIGINT) AS cluster,
      |  CAST(sz AS BIGINT) AS n_nodes,
      |  CAST(sz * cluster + sz * (sz - 1) // 2 AS BIGINT) AS sum_ids
      |FROM comp
      |UNION ALL
      |SELECT CAST(g * 10 + ci * 64 AS BIGINT),
      |  CAST(64 AS BIGINT),
      |  CAST(64 * (g * 10 + ci * 64) + 2016 AS BIGINT)
      |FROM ch""".stripMargin

  // ---- q59: triangle census over planted cliques — K cliques of
  //      sizes 3..6 (per-node participation C(s-1,2) ∈ {1,3,6,10}),
  //      plus stars (hub degree 11 — the degree-orientation stress:
  //      naively a hub mints C(11,2) wedges, oriented it mints ZERO)
  //      and odd rings (0 triangles) as certified triangle-free mass.
  //      Output is the (n_tri → node count, node-id sum) histogram:
  //      a phantom triangle anywhere (stars, rings) adds a row; a
  //      missed one anywhere shifts a bucket — full-graph
  //      sensitivity at O(4) output rows. ----
  private def q59(spark: SparkSession, dir: String): DataFrame = {
    val gq = scaleOf(spark, dir)
    val gs = math.max(gq / 8L, 1L)
    val gr = math.max(gq / 8L, 1L)
    val cliques = spark.range(gq)
      .select((lit(3) + pmod(col("id"), lit(4))).as("s"), (col("id") * 8).as("base"))
      .select(col("s"), col("base"),
        explode(sequence(lit(0L), col("s") - 2)).as("i"))
      .select(col("base"), col("i"),
        explode(sequence(col("i") + 1, col("s") - 1)).as("j"))
      .select((col("base") + col("i")).as("a"), (col("base") + col("j")).as("b"))
    val stars = spark.range(gs)
      .select((lit(gq * 8L) + col("id") * 12L).as("base"),
        explode(sequence(lit(1L), lit(11L))).as("i"))
      .select(col("base").as("a"), (col("base") + col("i")).as("b"))
    val rings = spark.range(gr)
      .select((lit(gq * 8L + gs * 12L) + col("id") * 7L).as("base"),
        explode(sequence(lit(0L), lit(6L))).as("i"))
      .select(
        when(col("i") < 6, col("base") + col("i")).otherwise(col("base")).as("a"),
        when(col("i") < 6, col("base") + col("i") + 1)
          .otherwise(col("base") + 6).as("b"))
    graft.graph.Triangles
      .perNodeCounts(cliques.unionByName(stars).unionByName(rings),
        gtCache.persisted)
      .groupBy(col("n_tri"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("sum_nodes"))
  }

  private val q59Oracle =
    """WITH n AS (SELECT COUNT(*) AS n FROM lineitem),
      |p AS (SELECT GREATEST(n // 100, 1) AS gq FROM n),
      |cl AS (SELECT unnest(generate_series(0, gq - 1)) AS gi FROM p),
      |x AS (SELECT 3 + (gi % 4) AS sz, gi * 8 AS base FROM cl)
      |SELECT CAST((sz - 1) * (sz - 2) // 2 AS BIGINT) AS n_tri,
      |  CAST(SUM(sz) AS BIGINT) AS n_nodes,
      |  CAST(SUM(sz * base + sz * (sz - 1) // 2) AS BIGINT) AS sum_nodes
      |FROM x GROUP BY 1""".stripMargin

  // ---- q60: k-core census over planted cores — cliques of sizes
  //      4..6 (the {2,3}-core survivors, within-core degree s-1),
  //      rings of 8 with a 6-node PENDANT path (the cascade stress:
  //      k=2 peeling eats the pendant one node per round before the
  //      ring stabilizes at core-degree 2; k=3 erases the gadget
  //      entirely), and bare 9-node paths (peel to nothing at k=2).
  //      Output: per (k, core_degree) the surviving node count and
  //      id-sum — an unpeeled straggler, an over-peeled core, or an
  //      unconverged cascade all land in the wrong bucket. ----
  private def q60(spark: SparkSession, dir: String): DataFrame = {
    val gq = scaleOf(spark, dir)
    val gr = math.max(gq / 8L, 1L)
    val gp = math.max(gq / 8L, 1L)
    val cliques = spark.range(gq)
      .select((lit(4) + pmod(col("id"), lit(3))).as("s"), (col("id") * 8).as("base"))
      .select(col("s"), col("base"),
        explode(sequence(lit(0L), col("s") - 2)).as("i"))
      .select(col("base"), col("i"),
        explode(sequence(col("i") + 1, col("s") - 1)).as("j"))
      .select((col("base") + col("i")).as("a"), (col("base") + col("j")).as("b"))
    val ringBase = lit(gq * 8L)
    val rings = spark.range(gr)
      .select((ringBase + col("id") * 16L).as("base"),
        explode(sequence(lit(0L), lit(13L))).as("i"))
      .select(
        when(col("i") < 7, col("base") + col("i"))         // ring path edges
          .when(col("i") === 7, col("base"))               // ring closing edge
          .when(col("i") === 8, col("base"))               // pendant attach
          .otherwise(col("base") + col("i") - 1).as("a"),  // pendant chain
        when(col("i") < 7, col("base") + col("i") + 1)
          .when(col("i") === 7, col("base") + 7)
          .when(col("i") === 8, col("base") + 8)
          .otherwise(col("base") + col("i")).as("b"))
    val paths = spark.range(gp)
      .select((lit(gq * 8L + gr * 16L) + col("id") * 9L).as("base"),
        explode(sequence(lit(1L), lit(8L))).as("i"))
      .select((col("base") + col("i") - 1).as("a"), (col("base") + col("i")).as("b"))
    val edges = gtCache.persisted(
      cliques.unionByName(rings).unionByName(paths))
    Seq(2, 3).map { k =>
      graft.graph.KCore.kCore(edges, k)
        .groupBy(col("core_degree"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("sum_nodes"))
        .select(lit(k).as("k"), col("core_degree"), col("n_nodes"),
          col("sum_nodes"))
    }.reduce(_ unionByName _)
  }

  private val q60Oracle =
    """WITH n AS (SELECT COUNT(*) AS n FROM lineitem),
      |p AS (SELECT GREATEST(n // 100, 1) AS gq,
      |        GREATEST(GREATEST(n // 100, 1) // 8, 1) AS gr FROM n),
      |cl AS (SELECT unnest(generate_series(0, gq - 1)) AS gi FROM p),
      |x AS (SELECT 4 + (gi % 3) AS sz, gi * 8 AS base FROM cl),
      |cliq AS (
      |  SELECT sz - 1 AS core_degree, SUM(sz) AS n_nodes,
      |    SUM(sz * base + sz * (sz - 1) // 2) AS sum_nodes
      |  FROM x GROUP BY 1),
      |rg AS (SELECT unnest(generate_series(0, gr - 1)) AS ri, gq FROM p),
      |ring AS (
      |  SELECT 2 AS core_degree, SUM(8) AS n_nodes,
      |    SUM(8 * (gq * 8 + ri * 16) + 28) AS sum_nodes
      |  FROM rg GROUP BY 1)
      |SELECT CAST(2 AS INT) AS k, CAST(core_degree AS BIGINT) AS core_degree,
      |  CAST(n_nodes AS BIGINT) AS n_nodes, CAST(sum_nodes AS BIGINT) AS sum_nodes
      |FROM (SELECT * FROM cliq UNION ALL SELECT * FROM ring) two
      |UNION ALL
      |SELECT CAST(3 AS INT), CAST(core_degree AS BIGINT),
      |  CAST(n_nodes AS BIGINT), CAST(sum_nodes AS BIGINT)
      |FROM cliq""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q58_planted_components", q58, Some(q58Oracle)),
    GraftQuery("q59_planted_triangles", q59, Some(q59Oracle)),
    GraftQuery("q60_planted_kcore", q60, Some(q60Oracle)))
}
