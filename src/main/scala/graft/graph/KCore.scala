package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-core decomposition by iterative peeling — the graph-curation
 * primitive (spam/bot rings, weakly-attached catalog noise, and
 * low-engagement fringes all live OUTSIDE the core; training-data
 * graph filters keep the k-core).
 *
 * Each round removes every node whose current degree is below k and
 * drops the incident edges; the fixpoint is the k-core (the maximal
 * subgraph with all degrees ≥ k — round order cannot change it, so
 * any engine peeling to fixpoint agrees on the result).
 *
 * Scale shape: one degree aggregate + two semi-joins per round, all
 * hash-partitioned on node ids — no broadcast of anything node-sized,
 * no driver-side graph. The edge frame is `localCheckpoint`ed per
 * round (the q43/connectedComponents lineage-truncation recipe).
 * Rounds are data-bounded: each round that is not the fixpoint
 * removes ≥ 1 node, and in practice peeling cascades converge in
 * O(degeneracy ordering depth) — `maxRounds` is a LOUD guard, not a
 * silent truncation: exceeding it throws, so a caller's fixed-depth
 * oracle can never silently compare against an unconverged state.
 * The per-round driver action is a `limit(1).count()` existence probe
 * on the below-k frame — one row, not a full count.
 */
object KCore {

  /** Nodes of the k-core of the undirected graph `edges` (one row per
    * edge, columns `a`/`b`, no self-loops) with their within-core
    * degree. Empty when the k-core is empty. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 16): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // both orientations from ONE pass over the edge subtree (r21,
    // guide §2.4): the old select-union-select planted the caller's
    // edge lineage twice in the checkpoint job
    var sym = edges.select(inline(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))))
      .localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds <= maxRounds) {
      // checkpoint the round's degree frame (r21): it feeds THREE plan
      // positions — the convergence probe and both semi-joins (through
      // `keep`) — so unmaterialized, the degree aggregate over the
      // whole edge frame ran three times per peeling round. Eager
      // localCheckpoint, not persist(): a cached frame inside the loop
      // re-enters the optimizer as an InMemoryRelation every round and
      // measured ~20% SLOWER than block-backed checkpoints here.
      val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("__deg"))
        .localCheckpoint(true)
      val lowExists = deg.filter(col("__deg") < k).limit(1).count() > 0
      if (!lowExists) converged = true
      else {
        val keep = deg.filter(col("__deg") >= k).select("u")
        sym = sym
          .join(keep, Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
          .localCheckpoint() // eager — deg's cache is consumed here
        rounds += 1
      }
    }
    require(converged,
      s"k-core did not converge within $maxRounds peeling rounds — " +
        s"raise maxRounds (and any fixed-depth oracle unroll with it)")
    sym.groupBy(col("u")).agg(count(lit(1)).as("core_degree"))
      .select(col("u").as("node"), col("core_degree"))
  }
}
