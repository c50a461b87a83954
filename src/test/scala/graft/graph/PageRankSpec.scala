package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PageRankSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 10): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a symmetric cycle keeps all ranks equal and conserves mass") {
    val cycle = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L, 3L -> 2L, 1L -> 3L)
    val pr = ranks(cycle)
    assert(pr.size == 3)
    assert(pr.values.toSet.size == 1, s"symmetric ranks diverged: $pr")
    // integer truncation leaks at most a few units per node per round
    val total = pr.values.sum
    assert(total <= PageRank.Scale && total >= PageRank.Scale - 200L,
      s"mass not conserved: $total")
  }

  test("a star's center outranks its leaves") {
    val star = (2L to 6L).flatMap(leaf => Seq(1L -> leaf, leaf -> 1L))
    val pr = ranks(star)
    val leaves = (2L to 6L).map(pr)
    assert(leaves.toSet.size == 1) // leaves are symmetric
    assert(pr(1L) > leaves.head * 3,
      s"center ${pr(1L)} should dominate leaf ${leaves.head}")
  }

  test("ranks are independent of input partitioning (integer exactness)") {
    val edges = (1L to 40L).flatMap { i =>
      val j = i % 7 + 1
      Seq(i -> j, j -> i)
    }.distinct
    val one = PageRank.run(edges.toDF("src", "dst").coalesce(1), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = PageRank.run(edges.toDF("src", "dst").repartition(13), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }
}
