package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BfsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def dists(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, Long] =
    Bfs.run(edges.toDF("src", "dst"), seeds.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph: hop distances count edges; nodes past the round cap are absent") {
    val path = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val d = dists(path, Seq(1L), rounds = 3)
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multi-source min: each node takes the nearest seed; disconnected nodes never appear") {
    // two seeds on a path 1-2-3-4-5, plus an island 9->10
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 9L -> 10L)
    val d = dists(edges, Seq(1L, 5L), rounds = 4)
    // 5 is a seed (dist 0) even though nothing reaches it forward
    assert(d == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("frontier algorithm equals the naive min-fold reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .distinct
    val seeds = Seq(0L, 17L)
    val rounds = 4
    // reference: re-expand the whole reached set each round, min-fold
    var ref = seeds.map(_ -> 0L).toMap
    for (r <- 1 to rounds) {
      val grown = ref.toSeq ++ edges.flatMap { case (s, t) =>
        ref.get(s).map(d => t -> (d + 1L))
      }
      ref = grown.groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min }
    }
    assert(dists(edges, seeds, rounds) == ref)
    // the naive-fold SQL rendering (the formulation the layered oracle
    // is proved against) agrees with the same hand-rolled reference
    edges.toDF("src", "dst").createOrReplaceTempView("edges")
    seeds.distinct.toDF("node")
      .selectExpr("node", "CAST(0 AS BIGINT) AS dist")
      .createOrReplaceTempView("d0")
    val naiveSql = spark.sql(
        s"WITH ${Bfs.oracleIterCtes(rounds)} SELECT node, dist FROM d$rounds")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(naiveSql == ref)
  }

  test("layered min-fold SQL equals the frontier algorithm on a random graph") {
    // the 10x-tier oracle formulation: expand only the newest layer
    // each round (oracleLayeredCtes) — pinned here against the
    // frontier engine in-engine, so the cheap SQL the DuckDB gate runs
    // is itself gated by the algorithm it gates
    val rnd = new scala.util.Random(11)
    val edges = (1 to 400).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .distinct
    val seeds = Seq(0L, 23L)
    val rounds = 4
    edges.toDF("src", "dst").createOrReplaceTempView("edges")
    seeds.distinct.toDF("node")
      .selectExpr("node", "CAST(0 AS BIGINT) AS dist")
      .createOrReplaceTempView("d0")
    val layered = spark.sql(
        s"WITH ${Bfs.oracleLayeredCtes(rounds)} SELECT node, dist FROM d$rounds")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(layered == dists(edges, seeds, rounds))
  }
}
